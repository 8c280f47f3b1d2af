from .io import TABLE_SCHEMAS, load_table  # noqa: F401
from .jdbc import JdbcSource, avro_reader  # noqa: F401
