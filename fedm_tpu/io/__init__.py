from .files import Files, files, truncate_file
from .logging import log
from .vtu import VtuSeriesWriter, write_vtu, read_vtu
from .xdmf import XdmfH5Writer, read_checkpoints
from .output import OutputSeries, file_output
from .checkpoint import save_checkpoint, load_checkpoint
from .convenience import output_files, mesh_statistics

__all__ = [
    "Files", "files", "truncate_file", "log",
    "VtuSeriesWriter", "write_vtu", "read_vtu",
    "XdmfH5Writer", "read_checkpoints",
    "OutputSeries", "file_output",
    "save_checkpoint", "load_checkpoint",
    "output_files", "mesh_statistics",
]
