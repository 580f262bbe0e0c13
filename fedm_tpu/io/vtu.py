"""VTU/PVD output: VTK XML unstructured-grid files.

Replaces the reference's dolfin `File('*.pvd') << (function, t)` output
(`/root/reference/fedm/file_io.py:148-188`): each write appends a
`<name>%06d.vtu` snapshot and re-emits the `.pvd` collection file indexing
all snapshots by timestep — the layout ParaView (and the reference's own
regression reader, `tests/integrated_tests/testing_utils.py:16-20`)
expects. A minimal reader is provided for round-trip tests.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

_VTK_CELL_TYPES = {1: 3, 2: 5}  # dim -> VTK_LINE / VTK_TRIANGLE


def write_vtu(path, mesh, point_data: dict) -> None:
    """Write one .vtu snapshot (ascii XML). point_data: name -> [n_verts]."""
    coords = mesh.coords
    cells = mesh.cells
    n_pts, dim = coords.shape
    pts3 = np.zeros((n_pts, 3))
    pts3[:, :dim] = coords
    vtk_type = _VTK_CELL_TYPES[dim]
    nv = cells.shape[1]

    def arr2str(a, fmt="{:.16g}"):
        return " ".join(fmt.format(x) for x in np.asarray(a).ravel())

    with open(path, "w") as f:
        f.write('<?xml version="1.0"?>\n')
        f.write('<VTKFile type="UnstructuredGrid" version="0.1" '
                'byte_order="LittleEndian">\n')
        f.write("  <UnstructuredGrid>\n")
        f.write(f'    <Piece NumberOfPoints="{n_pts}" '
                f'NumberOfCells="{len(cells)}">\n')
        f.write("      <Points>\n")
        f.write('        <DataArray type="Float64" NumberOfComponents="3" '
                'format="ascii">\n')
        f.write("          " + arr2str(pts3) + "\n")
        f.write("        </DataArray>\n      </Points>\n")
        f.write("      <Cells>\n")
        f.write('        <DataArray type="Int32" Name="connectivity" '
                'format="ascii">\n')
        f.write("          " + arr2str(cells, "{:d}") + "\n")
        f.write("        </DataArray>\n")
        f.write('        <DataArray type="Int32" Name="offsets" '
                'format="ascii">\n')
        f.write("          " + arr2str(np.arange(1, len(cells) + 1) * nv,
                                       "{:d}") + "\n")
        f.write("        </DataArray>\n")
        f.write('        <DataArray type="UInt8" Name="types" '
                'format="ascii">\n')
        f.write("          " + arr2str(np.full(len(cells), vtk_type), "{:d}")
                + "\n")
        f.write("        </DataArray>\n      </Cells>\n")
        f.write("      <PointData>\n")
        for name, values in point_data.items():
            f.write(f'        <DataArray type="Float64" Name="{name}" '
                    'format="ascii">\n')
            f.write("          " + arr2str(values) + "\n")
            f.write("        </DataArray>\n")
        f.write("      </PointData>\n")
        f.write("    </Piece>\n  </UnstructuredGrid>\n</VTKFile>\n")


def read_vtu(path, field_name: str) -> np.ndarray:
    """Minimal ascii-VTU point-data reader (test-side round-trips)."""
    import xml.etree.ElementTree as ET

    root = ET.parse(path).getroot()
    for da in root.iter("DataArray"):
        if da.get("Name") == field_name:
            return np.fromstring(da.text.strip(), sep=" ")
    raise KeyError(f"field '{field_name}' not found in {path}")


class VtuSeriesWriter:
    """A `<dir>/<name>/<name>.pvd` time series of `.vtu` snapshots
    (dolfin File layout, `fedm/file_io.py:179-184`)."""

    def __init__(self, name: str, directory):
        self.name = name
        self.dir = Path(directory) / name
        self.dir.mkdir(parents=True, exist_ok=True)
        self.snapshots = []  # (timestep, filename)

    def write(self, mesh, values, t: float, field_name: Optional[str] = None):
        fname = f"{self.name}{len(self.snapshots):06d}.vtu"
        write_vtu(self.dir / fname, mesh,
                  {field_name or self.name: np.asarray(values)})
        self.snapshots.append((t, fname))
        self._write_pvd()

    def _write_pvd(self):
        with open(self.dir / f"{self.name}.pvd", "w") as f:
            f.write('<?xml version="1.0"?>\n')
            f.write('<VTKFile type="Collection" version="0.1" '
                    'byte_order="LittleEndian">\n  <Collection>\n')
            for t, fname in self.snapshots:
                f.write(f'    <DataSet timestep="{t}" part="0" '
                        f'file="{fname}" />\n')
            f.write("  </Collection>\n</VTKFile>\n")
