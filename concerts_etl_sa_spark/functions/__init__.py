from . import text, dates, money, ids  # noqa: F401
