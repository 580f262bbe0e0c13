from .files import Files, files, truncate_file
from .logging import log

__all__ = ["Files", "files", "truncate_file", "log"]
