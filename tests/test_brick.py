"""Brick-packed hash rows (PERF.md r5): the probe's candidate set must be
EXACTLY the per-cell template's — the brick cover is a superset of cells whose
non-members are masked by the integer parity membership table, so on a
collision-free map every probe path returns bit-identical results to the
legacy per-cell layout.  (Under collisions the two layouts differ only in
which rare hash-slot overwrites occur — different hash function domain.)

Ref semantics being preserved: reference model/neural_points.py:430-509
(search template + radius search), :555-565 (top-k by dist^2).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pin_slam_tpu.config import Config
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.slam import mapper as mp


@pytest.fixture(scope="module")
def maps():
    cfg = Config()
    cfg.map_capacity = 1 << 14
    cfg.local_map_capacity = 1 << 12
    cfg.buffer_size = 1 << 18
    cfg.downsample_hash_size = 1 << 16
    cfg._derive()
    mc_b = npts.MapConfig.from_config(cfg)
    assert mc_b.brick == (2, 2, 1)          # use_brick_hash="auto" default
    mc_c = dataclasses.replace(mc_b, brick=(1, 1, 1))
    rng = np.random.default_rng(3)
    pts = rng.uniform(-6, 6, size=(3000, 3)).astype(np.float32)
    travel = jnp.zeros((1 << 16,), jnp.float32)
    out = {}
    for name, mc in (("cell", mc_c), ("brick", mc_b)):
        st = npts.init_map_state(mc)
        st = npts.map_insert(st, mc, jnp.asarray(pts), jnp.ones((3000,), bool),
                             jnp.int32(0), travel,
                             downsample_table_size=cfg.downsample_hash_size)
        out[name] = (mc, npts.build_local_map(st, mc, jnp.zeros(3),
                                              jnp.int32(0), travel))
    out["cfg"] = cfg
    out["tmpl"] = npts.make_probe_template(mc_b, cfg.num_nei_cells,
                                           cfg.search_alpha)
    out["offsets"] = jnp.asarray(npts.neighbor_offsets(cfg.num_nei_cells,
                                                       cfg.search_alpha))
    out["q"] = jnp.asarray(rng.uniform(-5, 5, size=(512, 3)).astype(np.float32))
    return out


def test_template_covers_all_parities(maps):
    """Every parity variant's membership mask covers exactly K cells."""
    tmpl, offsets = maps["tmpl"], maps["offsets"]
    K = offsets.shape[0]
    member_counts = np.asarray(tmpl.memb).sum(axis=1)
    np.testing.assert_array_equal(member_counts, np.full(len(member_counts), K))


def test_probe_rank_matches_cell_layout(maps):
    """_probe_rank through the brick table == legacy per-cell layout
    (collision-free map => identical candidate sets, ranks, payloads)."""
    mc_c, lm_c = maps["cell"]
    mc_b, lm_b = maps["brick"]
    q = maps["q"]
    g_c, p_c, v_c = mp._probe_rank(lm_c, mc_c, maps["offsets"], q,
                                   q[:, None, :], 6)
    g_b, p_b, v_b = mp._probe_rank(lm_b, mc_b, maps["tmpl"], q,
                                   q[:, None, :], 6)
    np.testing.assert_array_equal(np.asarray(g_c), np.asarray(g_b))
    np.testing.assert_array_equal(np.asarray(v_c), np.asarray(v_b))
    np.testing.assert_array_equal(np.asarray(p_c)[np.asarray(v_c)],
                                  np.asarray(p_b)[np.asarray(v_b)])


def test_rank_kernel_matches_xla_on_brick(maps):
    """The Pallas rank kernel (interpret on CPU) over brick field-major rows
    == the XLA brick path."""
    mc_b, lm_b = maps["brick"]
    q = maps["q"][:256]
    g1, p1, v1 = mp._probe_rank(lm_b, mc_b, maps["tmpl"], q, q[:, None, :], 6,
                                use_rank_kernel=False)
    g2, p2, v2 = mp._probe_rank(lm_b, mc_b, maps["tmpl"], q, q[:, None, :], 6,
                                use_rank_kernel=True)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_knn_search_matches_cell_layout(maps):
    """knn_search (tracker/mesher path) addresses single sub-cell rows —
    same row count as legacy, identical results."""
    mc_c, lm_c = maps["cell"]
    mc_b, lm_b = maps["brick"]
    q = maps["q"]
    r_c = npts.knn_search(lm_c, mc_c, q, maps["offsets"])
    r_b = npts.knn_search(lm_b, mc_b, q, maps["offsets"])
    L = mc_c.local_capacity
    g_c = np.where(np.asarray(r_c.lidx) < L,
                   np.asarray(lm_c.indices)[np.asarray(r_c.lidx)], -1)
    g_b = np.where(np.asarray(r_b.lidx) < L,
                   np.asarray(lm_b.indices)[np.asarray(r_b.lidx)], -1)
    np.testing.assert_array_equal(g_c, g_b)
    np.testing.assert_array_equal(np.asarray(r_c.nn_count),
                                  np.asarray(r_b.nn_count))


def test_query_certainty_matches_cell_layout(maps):
    mc_c, lm_c = maps["cell"]
    mc_b, lm_b = maps["brick"]
    q = maps["q"]
    c_c = npts.query_certainty(lm_c, mc_c, q)
    c_b = npts.query_certainty(lm_b, mc_b, q)
    np.testing.assert_array_equal(np.asarray(c_c), np.asarray(c_b))


def test_append_knn_through_templates(maps):
    """append_knn with ProbeTemplates (incl. dedup budgets + drop mask) ==
    the legacy layout end to end."""
    mc_c, lm_c = maps["cell"]
    mc_b, lm_b = maps["brick"]
    rng = np.random.default_rng(11)
    coords = jnp.asarray(rng.uniform(-5, 5, size=(64 * 7, 3)).astype(np.float32))
    out_c = mp.append_knn(lm_c, mc_c, maps["offsets"], coords, 7, near_count=4,
                          dedup_far_budget=128, return_dropped=True)
    out_b = mp.append_knn(lm_b, mc_b, maps["tmpl"], coords, 7, near_count=4,
                          dedup_far_budget=128, return_dropped=True)
    for a, b, name in zip(out_c, out_b, ("gidx", "w", "vec", "dropped")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_negative_coordinates_exact(maps):
    """floor-division brick/parity math must be exact for negative cells."""
    mc_b, _ = maps["brick"]
    cells = jnp.asarray([[-5, -4, -3], [-1, -1, -1], [0, 0, 0], [1, 2, 3]],
                        jnp.int32)
    flat = npts.subcell_hash(mc_b, cells)
    bx, by, bz = mc_b.brick
    for c, f in zip(np.asarray(cells), np.asarray(flat)):
        b = np.floor_divide(c, [bx, by, bz])
        s = (c - b * [bx, by, bz])
        assert (s >= 0).all() and (s < [bx, by, bz]).all()
        assert int(f) % mc_b.nsub == s[0] * (by * bz) + s[1] * bz + s[2]
