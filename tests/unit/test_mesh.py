import numpy as np
import pytest

from fedm_tpu.mesh import interval_mesh, rectangle_mesh, mark_boundaries


def test_interval_mesh_basic():
    m = interval_mesh(10, 0.0, 1.0)
    assert m.n_verts == 11
    assert m.n_cells == 10
    assert m.dim == 1
    assert np.isclose(m.hmax(), 0.1)
    # boundary: two endpoint vertices
    assert len(m.boundary_facets) == 2
    bverts = set(m.boundary_facets.ravel().tolist())
    assert bverts == {0, 10}
    n = m.facet_normals().ravel()
    signs = {m.boundary_facets[i, 0]: n[i] for i in range(2)}
    assert signs[0] == -1.0 and signs[10] == 1.0


@pytest.mark.parametrize("diagonal,cells_per_quad", [
    ("right", 2), ("left", 2), ("crossed", 4),
])
def test_rectangle_mesh_counts_and_area(diagonal, cells_per_quad):
    nx, ny = 4, 3
    m = rectangle_mesh((0, 0), (2.0, 1.5), nx, ny, diagonal)
    assert m.n_cells == cells_per_quad * nx * ny
    # total area via cross products
    x = m.coords[m.cells]
    v1, v2 = x[:, 1] - x[:, 0], x[:, 2] - x[:, 0]
    area = 0.5 * np.abs(v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0]).sum()
    assert np.isclose(area, 3.0)
    # boundary edge count: perimeter quads
    assert len(m.boundary_facets) == 2 * (nx + ny)


def test_facet_normals_outward():
    m = rectangle_mesh((0, 0), (1, 1), 3, 3, "crossed")
    n = m.facet_normals()
    mid = m.facet_midpoints()
    # normal at boundary midpoint points away from the centre (0.5, 0.5)
    outward = np.sum(n * (mid - 0.5), axis=1)
    assert (outward > 0).all()


def test_mark_boundaries_rectangle():
    # same boundary list format as examples/glow_discharge/fedm-gd.py:138-141
    wall, gap = 0.01, 0.02
    m = rectangle_mesh((0, 0), (wall, gap), 4, 5)
    boundaries = [
        ["line", 0.0, 0.0, 0.0, wall],      # z = 0 (powered)
        ["line", gap, gap, 0.0, wall],      # z = gap (grounded)
        ["line", 0.0, gap, 0.0, 0.0],       # r = 0 (axis)
        ["line", 0.0, gap, wall, wall],     # r = wall
    ]
    markers = mark_boundaries(m, boundaries)
    assert (markers > 0).all()  # every boundary facet claimed
    mid = m.facet_midpoints()
    assert (markers[np.isclose(mid[:, 1], 0.0)] == 1).all()
    assert (markers[np.isclose(mid[:, 1], gap)] == 2).all()
    assert (markers[np.isclose(mid[:, 0], 0.0) & ~np.isclose(mid[:, 1], 0)
                    & ~np.isclose(mid[:, 1], gap)] == 3).all()
    assert (markers[np.isclose(mid[:, 0], wall) & ~np.isclose(mid[:, 1], 0)
                    & ~np.isclose(mid[:, 1], gap)] == 4).all()
    # counts: bottom/top get nx facets, sides ny facets (corners go to the
    # later-listed side boundaries only where both predicates hold; the
    # corner facets on z-lines are claimed by r-lines if they match, but a
    # z=0 facet has both vertices at z=0 so only matches boundary 1)
    assert (markers == 1).sum() == 4
    assert (markers == 2).sum() == 4


def test_mark_point_boundaries_1d():
    m = interval_mesh(8, 0.0, 1e-3)
    markers = mark_boundaries(m, [["point", 0.0], ["point", 1e-3]])
    mid = m.facet_midpoints()[:, 0]
    assert markers[np.isclose(mid, 0.0)] == 1
    assert markers[np.isclose(mid, 1e-3)] == 2
