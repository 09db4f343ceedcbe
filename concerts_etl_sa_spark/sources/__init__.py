from .readers import load_table, load_all  # noqa: F401
