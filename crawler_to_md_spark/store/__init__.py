from crawler_to_md_spark.store.warehouse import SnapshotStore  # noqa: F401
from crawler_to_md_spark.store import schemas  # noqa: F401
