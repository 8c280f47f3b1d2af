from .io import TABLE_SCHEMAS, load_table  # noqa: F401
