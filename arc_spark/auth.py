"""Per-stage cloud-credential plumbing → Hadoop configuration.

The reference applies an optional ``authentication`` map before every
extract/load touches its URI (``util/CloudUtils.scala:30-150``,
``setHadoopConfiguration`` called from e.g.
``extract/ParquetExtract.scala:140``). The translation targets are plain
public Hadoop connector keys (hadoop-aws ``fs.s3a.*``, hadoop-azure
``fs.azure.*`` / ``fs.adl.*``, GCS connector ``fs.gs.*``); setting them
on the live ``sparkContext.hadoopConfiguration`` makes both Spark's own
readers/writers and the driver-side ``arc_spark.fs.HadoopFS`` bridge pick
them up.
"""

from __future__ import annotations

_S3A_CLEAR = (
    "fs.s3a.access.key",
    "fs.s3a.secret.key",
    "fs.s3a.server-side-encryption-algorithm",
    "fs.s3a.server-side-encryption.key",
)


def apply_authentication(spark, auth: dict | None) -> dict[str, str]:
    """Apply an Arc-style ``authentication`` map to the session's Hadoop
    configuration; returns the key/value pairs that were set (secrets
    included — callers must not log values). No-op when ``auth`` is None.

    Supported methods mirror the reference's ``API.Authentication``
    (api/API.scala:420-450): AmazonAccessKey, AmazonAnonymous,
    AmazonEnvironmentVariable, AmazonIAM, AzureSharedKey,
    AzureSharedAccessSignature, AzureDataLakeStorageToken,
    AzureDataLakeStorageGen2AccountKey, AzureDataLakeStorageGen2OAuth,
    GoogleCloudStorageKeyFile.
    """
    if not auth:
        return {}
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    method = auth.get("method")
    out: dict[str, str] = {}

    def _set(k: str, v) -> None:
        out[k] = str(v)

    if method == "AmazonAccessKey":
        for k in _S3A_CLEAR:
            hc.unset(k)
        bucket = auth.get("bucket")
        prefix = f"fs.s3a.bucket.{bucket}" if bucket else "fs.s3a"
        if bucket:
            _set(
                f"{prefix}.aws.credentials.provider",
                "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider",
            )
        _set(f"{prefix}.access.key", auth["accessKeyID"])
        _set(f"{prefix}.secret.key", auth["secretAccessKey"])
        if auth.get("endpoint"):
            _set(f"{prefix}.endpoint", auth["endpoint"])
        if auth.get("sslEnabled") is not None:
            _set("fs.s3a.connection.ssl.enabled", str(auth["sslEnabled"]).lower())
    elif method == "AmazonAnonymous":
        bucket = auth.get("bucket")
        prefix = f"fs.s3a.bucket.{bucket}" if bucket else "fs.s3a"
        _set(
            f"{prefix}.aws.credentials.provider",
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider",
        )
    elif method == "AmazonEnvironmentVariable":
        bucket = auth.get("bucket")
        prefix = f"fs.s3a.bucket.{bucket}" if bucket else "fs.s3a"
        _set(
            f"{prefix}.aws.credentials.provider",
            "com.amazonaws.auth.EnvironmentVariableCredentialsProvider",
        )
    elif method == "AmazonIAM":
        for k in _S3A_CLEAR[2:]:
            hc.unset(k)
        bucket = auth.get("bucket")
        if bucket:
            # bucket-scoped instance-profile chain (CloudUtils.scala sets
            # InstanceProfile/ContainerCredentials for the named bucket):
            # without this a bucket-scoped IAM config silently inherits
            # whatever GLOBAL provider/keys an earlier stage configured —
            # possibly stale AccessKey credentials for another bucket
            _set(
                f"fs.s3a.bucket.{bucket}.aws.credentials.provider",
                "org.apache.hadoop.fs.s3a.auth.IAMInstanceCredentialsProvider",
            )
            hc.unset(f"fs.s3a.bucket.{bucket}.access.key")
            hc.unset(f"fs.s3a.bucket.{bucket}.secret.key")
        else:
            for k in _S3A_CLEAR[:2]:
                hc.unset(k)
        enc = auth.get("encryptionAlgorithm")
        if enc == "SSE-S3":
            _set("fs.s3a.server-side-encryption-algorithm", "SSE-S3")
        elif enc == "SSE-KMS" and auth.get("kmsArn"):
            _set("fs.s3a.server-side-encryption-algorithm", "SSE-KMS")
            _set("fs.s3a.server-side-encryption.key", auth["kmsArn"])
        elif enc == "SSE-C" and auth.get("customKey"):
            _set("fs.s3a.server-side-encryption-algorithm", "SSE-C")
            _set("fs.s3a.server-side-encryption.key", auth["customKey"])
    elif method == "AzureSharedKey":
        _set(
            f"fs.azure.account.key.{auth['accountName']}.blob.core.windows.net",
            auth["signature"],
        )
    elif method == "AzureSharedAccessSignature":
        _set(
            f"fs.azure.sas.{auth['container']}.{auth['accountName']}.blob.core.windows.net",
            auth["token"],
        )
    elif method == "AzureDataLakeStorageToken":
        _set("fs.adl.oauth2.access.token.provider.type", "RefreshToken")
        _set("fs.adl.oauth2.client.id", auth["clientID"])
        _set("fs.adl.oauth2.refresh.token", auth["refreshToken"])
    elif method == "AzureDataLakeStorageGen2AccountKey":
        _set(
            f"fs.azure.account.key.{auth['accountName']}.dfs.core.windows.net",
            auth["accessKey"],
        )
    elif method == "AzureDataLakeStorageGen2OAuth":
        _set("fs.azure.account.auth.type", "OAuth")
        _set(
            "fs.azure.account.oauth.provider.type",
            "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider",
        )
        _set("fs.azure.account.oauth2.client.id", auth["clientID"])
        _set("fs.azure.account.oauth2.client.secret", auth["secret"])
        _set(
            "fs.azure.account.oauth2.client.endpoint",
            f"https://login.microsoftonline.com/{auth['directoryID']}/oauth2/token",
        )
    elif method == "GoogleCloudStorageKeyFile":
        _set("google.cloud.auth.service.account.enable", "true")
        _set("fs.gs.project.id", auth["projectID"])
        _set("google.cloud.auth.service.account.json.keyfile", auth["keyFilePath"])
    else:
        raise ValueError(f"unknown authentication method: {method!r}")

    for k, v in out.items():
        hc.set(k, v)
    return out
