from clj_kinesis_to_firehose_spark.storage.snapshots import (  # noqa: F401
    CommitConflictError,
    SnapshotTable,
)
