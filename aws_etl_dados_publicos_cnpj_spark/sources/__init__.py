from .cnpj_csv import read_cnpj_csv  # noqa: F401
from .sink import register_table, write_snapshot  # noqa: F401
