"""Isosurface extraction tests against analytic SDFs."""

import numpy as np

from pin_slam_tpu.ops import marching_cubes as mcubes


def sphere_grid(n=48, r=1.0, half=1.5):
    xs = np.linspace(-half, half, n)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    sdf = np.linalg.norm(g, axis=-1) - r
    spacing = xs[1] - xs[0]
    return sdf, (-half, -half, -half), spacing


def test_sphere_surface():
    sdf, origin, spacing = sphere_grid()
    verts, faces = mcubes.marching_tetrahedra(sdf, origin=origin, spacing=spacing)
    assert verts.shape[0] > 500
    assert faces.shape[0] > 500
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii.mean(), 1.0, atol=0.01)
    assert radii.std() < 0.01
    assert faces.max() < verts.shape[0]


def test_sphere_area():
    sdf, origin, spacing = sphere_grid(n=64)
    verts, faces = mcubes.marching_tetrahedra(sdf, origin=origin, spacing=spacing)
    fv = verts[faces]
    areas = 0.5 * np.linalg.norm(np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0]), axis=1)
    total = areas.sum()
    np.testing.assert_allclose(total, 4 * np.pi, rtol=0.03)


def test_mask_blocks_cells():
    sdf, origin, spacing = sphere_grid()
    mask = np.zeros(sdf.shape, dtype=bool)
    mask[:, :, : sdf.shape[2] // 2] = True  # only lower half valid
    verts, faces = mcubes.marching_tetrahedra(sdf, mask, origin=origin, spacing=spacing)
    assert verts.shape[0] > 100
    assert (verts[:, 2] <= 0.05).all()


def test_plane_surface():
    n = 16
    xs = np.linspace(0, 1, n)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    sdf = g[..., 2] - 0.5  # z = 0.5 plane
    verts, faces = mcubes.marching_tetrahedra(sdf, origin=(0, 0, 0), spacing=xs[1] - xs[0])
    np.testing.assert_allclose(verts[:, 2], 0.5, atol=1e-6)
    # watertight over the interior: every interior edge shared by exactly 2 faces
    assert faces.shape[0] >= 2 * (n - 1) ** 2


def test_empty_and_degenerate():
    sdf = np.ones((8, 8, 8))
    verts, faces = mcubes.marching_tetrahedra(sdf)
    assert verts.shape[0] == 0 and faces.shape[0] == 0
    verts, faces = mcubes.marching_tetrahedra(np.ones((1, 5, 5)))
    assert verts.shape[0] == 0


def test_filter_isolated_vertices():
    sdf, origin, spacing = sphere_grid(n=40)
    verts, faces = mcubes.marching_tetrahedra(sdf, origin=origin, spacing=spacing)
    v2, f2 = mcubes.filter_isolated_vertices(verts, faces, min_cluster=10)
    assert v2.shape[0] == verts.shape[0]  # one big component survives
    v3, f3 = mcubes.filter_isolated_vertices(verts, faces, min_cluster=verts.shape[0] + 1)
    assert v3.shape[0] == 0


def test_vertex_normals_point_outward():
    sdf, origin, spacing = sphere_grid(n=40)
    verts, faces = mcubes.marching_tetrahedra(sdf, origin=origin, spacing=spacing)
    vn = mcubes.vertex_normals(verts, faces)
    outward = verts / np.linalg.norm(verts, axis=1, keepdims=True)
    dots = np.abs((vn * outward).sum(1))
    assert dots.mean() > 0.95  # consistently (anti)radial
