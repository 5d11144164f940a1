from .rest import PaginatedRestSource  # noqa: F401
from .files import read_csv_dim, read_binary_files  # noqa: F401
