from arc_spark.lake.table import LakeTable, Snapshot  # noqa: F401
from arc_spark.lake.catalog import CatalogSnapshot, LakeCatalog  # noqa: F401
