"""Correspondence-free point-to-implicit registration (odometry).

TPU-native re-design of the reference tracker (reference utils/tracker.py:39-600):

* The reference runs <=50 python iterations, each a chain of CUDA launches plus
  a float64 6x6 solve (utils/tracker.py:92-135,468-520).  Here the ENTIRE
  Gauss-Newton/LM loop is one jitted ``lax.while_loop`` on device: transform ->
  hash query -> SDF + analytic gradient (jax.vjp) -> robust weights -> JtWJ
  reduction -> damped 6x6 solve -> se(3) update -> convergence/health gates.
* The reference solves in f64 because its world-frame point coordinates are
  km-scale (utils/tracker.py:491).  TPUs have no fast f64, so we register in a
  *sensor-centered shifted frame*: the caller supplies ``origin`` (the initial
  translation, f64 on host) and the device only ever sees coordinates of
  magnitude <= max_range.  The normal equations are additionally Jacobi
  (diagonal) preconditioned, which makes the f32 solve as well-conditioned as
  the reference's f64 one.
* Health gates (residual monotonicity, valid-point ratio, final residual,
  translation-Hessian eigenvalue check; utils/tracker.py:118-174) are computed
  on device and returned as flags; the host keeps the constant-velocity guess
  when the flags say the registration failed (utils/tracker.py:170-172).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from pin_slam_tpu.models import decoder as dec
from pin_slam_tpu.models import neural_points as npts
from pin_slam_tpu.ops import smallmat
from pin_slam_tpu.ops.transforms import so3_expmap


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    reg_iter_n: int = 50
    min_grad_norm: float = 0.5
    max_grad_norm: float = 2.0
    GM_dist: float = 0.5
    GM_grad: float = 0.2
    lm_lambda: float = 1e-4
    term_thre_deg: float = 0.01
    term_thre_m: float = 0.0005
    max_sdf_std_ratio: float = 1.0
    surface_sample_range: float = 0.25
    eigenvalue_check: bool = True
    consist_weight_on: bool = True
    mask_min_nn_count: int = 6          # = query_nn_k (ref utils/tracker.py:292)
    min_valid_points: int = 30
    min_valid_ratio: float = 0.2
    max_increment_ratio: float = 1.1
    eigenvalue_ratio_thre: float = 0.01
    photometric_on: bool = False
    photometric_weight: float = 0.01
    color_channel: int = 0

    @staticmethod
    def from_config(cfg, loop_reg: bool = False) -> "TrackerConfig":
        return TrackerConfig(
            reg_iter_n=cfg.reg_iter_n,
            min_grad_norm=cfg.reg_min_grad_norm,
            max_grad_norm=cfg.reg_max_grad_norm,
            GM_dist=cfg.reg_GM_dist_m,
            GM_grad=cfg.reg_GM_grad,
            lm_lambda=cfg.reg_lm_lambda,
            term_thre_deg=cfg.reg_term_thre_deg,
            term_thre_m=cfg.reg_term_thre_m,
            max_sdf_std_ratio=cfg.max_sdf_std_ratio,
            surface_sample_range=cfg.surface_sample_range_m,
            eigenvalue_check=cfg.eigenvalue_check,
            consist_weight_on=cfg.consist_wieght_on,
            mask_min_nn_count=cfg.query_nn_k,
            min_valid_ratio=0.15 if loop_reg else 0.2,
            photometric_on=cfg.photometric_loss_on and cfg.color_on,
            photometric_weight=cfg.photometric_loss_weight,
            color_channel=cfg.color_channel,
        )


class TrackResult(NamedTuple):
    R: jax.Array               # (3,3) rotation, shifted frame == world rotation
    t: jax.Array               # (3,) translation in the shifted frame
    valid: jax.Array           # () bool — all health gates passed
    converged: jax.Array       # () bool
    iterations: jax.Array      # () i32
    sdf_residual_cm: jax.Array # () mean |residual| of valid points, cm
    valid_count: jax.Array     # () i32
    min_eigenvalue: jax.Array  # () smallest eigenvalue of the translation Hessian
    cov: jax.Array             # (6,6) covariance estimate (rot, trans)


def _gm_weight(k: float, r: jax.Array) -> jax.Array:
    """Geman-McClure robust weight (k/(k^2+r^2))^2 (ref utils/tracker.py:352-353)."""
    return (k / (k * k + r * r)) ** 2


def color_to_intensity(colors: jax.Array) -> jax.Array:
    """RGB [.,3] -> intensity, or pass single-channel through
    (ref utils/tools.py:296-300)."""
    if colors.ndim >= 1 and colors.shape[-1] == 3:
        return (0.144 * colors[..., 0] + 0.299 * colors[..., 1]
                + 0.587 * colors[..., 2])
    return colors[..., 0] if colors.ndim > 1 else colors


@partial(jax.jit, static_argnames=("mc", "tc"))
def track_frame(lm: npts.LocalMap, mc: npts.MapConfig,
                tc: TrackerConfig, geo_params: dec.DecoderParams, sdf_scale: float,
                offsets: jax.Array,
                source: jax.Array, source_valid: jax.Array,
                R_init: jax.Array, t_init: jax.Array,
                source_sdf: Optional[jax.Array] = None,
                color_params: Optional[dec.DecoderParams] = None,
                source_colors: Optional[jax.Array] = None,
                source_normals: Optional[jax.Array] = None,
                source_normal_valid: Optional[jax.Array] = None,
                after_pgo=False) -> TrackResult:
    """Register ``source`` (sensor-frame, padded) against the implicit map.

    R_init/t_init: initial guess with translation EXPRESSED IN THE SHIFTED
    FRAME (world minus origin); the local-map coordinates seen on device are
    ``points_shifted + lm.origin``... the neural map stores world-frame f32
    positions, so query coordinates are reconstructed as shifted + origin where
    ``origin = lm.origin`` (f32 rounding of the f64 host origin is folded back
    on the host).
    """
    n_src = source.shape[0]
    src_count = jnp.maximum(jnp.sum(source_valid, dtype=jnp.int32), 1)
    if source_sdf is None:
        source_sdf = jnp.zeros((n_src,), source.dtype)
    origin = lm.origin
    # ``offsets`` may be a ProbeTemplate (brick-layout maps): the candidate
    # cache probes whole brick rows with it; the per-cell paths (knn_search /
    # the vjp fallback) use its classic cell template
    cells_t = (offsets.cells if isinstance(offsets, npts.ProbeTemplate)
               else offsets)

    color_on = (color_params is not None and source_colors is not None
                and lm.color_features is not None)
    if color_on:
        src_intensity = color_to_intensity(source_colors)

    def sdf_fn(pts_world):
        knn = npts.knn_search(lm, mc, pts_world, cells_t)
        geo_feat, color_feat, w, _ = npts.interpolate_features(
            lm, mc, pts_world, knn.lidx, after_pgo=after_pgo, query_color=color_on)
        sdf_pred, sdf_std = dec.blended_sdf(geo_params, geo_feat, w,
                                            mc.weighted_first, sdf_scale)
        if color_on:
            col = dec.blended_head(dec.regress_color, color_params, color_feat,
                                   w, mc.weighted_first)
            intensity = color_to_intensity(col)
        else:
            intensity = jnp.zeros_like(sdf_pred)
        return (sdf_pred, intensity), (knn.nn_count, jax.lax.stop_gradient(sdf_std))

    max_sdf_std = tc.surface_sample_range * tc.max_sdf_std_ratio

    # the hand-derived gradient (tracker_grad.py) replaces jax.vjp on the
    # geometry-only paths — same numbers, fewer scatter ops, and it unlocks
    # the candidate CACHE (probe once per pose margin instead of re-probing
    # the hash every GN iteration).  Both interpolation modes since r5: the
    # per-neighbor blend (run_kitti's weighted_first=False) previously fell
    # back to vjp without the cache — measured as the dominant cost of the
    # KITTI odometry program.  (Positional encoding changes d(vec)/d(p), so
    # that path still falls back to vjp.)
    use_analytic = not color_on and mc.pos_encoding_band == 0

    def one_step(R, t, cache=None):
        cur = source @ R.T + t                       # shifted frame
        pts_world = cur + origin

        if use_analytic:
            from pin_slam_tpu.slam import tracker_grad as tg

            if cache is not None:
                sdf_pred, grad, nn_count, sdf_std = tg.sdf_value_and_grad_cached(
                    cache, lm, mc, geo_params, sdf_scale, pts_world, after_pgo)
            else:
                sdf_pred, grad, nn_count, sdf_std = tg.sdf_value_and_grad(
                    lm, mc, geo_params, sdf_scale, cells_t, pts_world, after_pgo)
            intensity = jnp.zeros_like(sdf_pred)
            vjp_fn = None
        else:
            (sdf_pred, intensity), vjp_fn, (nn_count, sdf_std) = jax.vjp(
                sdf_fn, pts_world, has_aux=True)
            grad = vjp_fn((jnp.ones_like(sdf_pred), jnp.zeros_like(intensity)))[0]

        grad_norm = jnp.linalg.norm(grad, axis=-1)
        mask = (source_valid
                & (nn_count >= tc.mask_min_nn_count)
                & (grad_norm > tc.min_grad_norm)
                & (grad_norm < tc.max_grad_norm)
                & (sdf_std < max_sdf_std))           # ref utils/tracker.py:305-309

        residual = sdf_pred - source_sdf
        grad_anomaly = grad_norm - 1.0
        w = _gm_weight(tc.GM_dist, residual) * _gm_weight(tc.GM_grad, grad_anomaly)
        if source_normals is not None:
            # normal-consistency weight 0.5 + |n . grad_unit|
            # (ref utils/tracker.py:331-359); normals are sensor-frame, so
            # rotate with the current pose estimate
            n_w = source_normals @ R.T
            grad_unit = grad / jnp.maximum(grad_norm, 1e-12)[:, None]
            w_normal = 0.5 + jnp.abs(jnp.sum(n_w * grad_unit, axis=-1))
            if source_normal_valid is not None:
                w_normal = jnp.where(source_normal_valid, w_normal, 1.0)
            w = w * w_normal
        if color_on and not tc.photometric_on and tc.consist_weight_on:
            # color (intensity) consistency weight (ref utils/tracker.py:382-386)
            w = w * jnp.exp(-jnp.abs(intensity - src_intensity))
        w = jnp.where(mask, w, 0.0)
        valid_count = jnp.sum(mask, dtype=jnp.int32)
        # normalize weights by 2*mean over valid (ref utils/tracker.py:394)
        w_mean = jnp.sum(w) / jnp.maximum(valid_count, 1)
        w = w / jnp.maximum(2.0 * w_mean, 1e-12)

        # J = [p x grad, grad] about the SHIFTED origin -> well-conditioned f32
        cross = jnp.cross(cur, grad)
        J = jnp.concatenate([cross, grad], axis=-1)  # (N,6)
        Jw = J * w[:, None]
        N = J.T @ Jw                                  # (6,6)
        g = -(Jw.T @ residual)

        if color_on and tc.photometric_on:
            # photometric term in the normal equations
            # (ref utils/tracker.py:523-554 ``implicit_color_reg``)
            c_grad = vjp_fn((jnp.zeros_like(sdf_pred), jnp.ones_like(intensity)))[0]
            c_resid = intensity - src_intensity
            J_c = jnp.concatenate([jnp.cross(cur, c_grad), c_grad], axis=-1)
            Jw_c = J_c * w[:, None]
            N = N + tc.photometric_weight * (J_c.T @ Jw_c)
            g = g - tc.photometric_weight * (Jw_c.T @ c_resid)

        res_cm = jnp.sum(jnp.where(mask, jnp.abs(residual), 0.0)) / jnp.maximum(valid_count, 1) * 100.0
        return N, g, res_cm, valid_count

    def solve(N, g):
        # LM diagonal damping + Jacobi preconditioning, f32.  Unrolled Cholesky:
        # jnp.linalg.solve's generic LU path is pathologically slow to compile
        # and run for a single 6x6 on TPU (see ops/smallmat.py)
        N_d = N + tc.lm_lambda * jnp.diag(jnp.diag(N))
        d = 1.0 / jnp.sqrt(jnp.clip(jnp.diag(N_d), 1e-12))
        Ns = N_d * d[:, None] * d[None, :]
        xs = smallmat.cholesky_solve6(Ns + 1e-7 * jnp.eye(6, dtype=N.dtype), d * g)
        return d * xs

    # candidate cache (analytic path): all random gathers hoisted out of the
    # GN iterations; refreshed in-loop only when the pose has moved enough to
    # change the probed cell neighborhoods (see tracker_grad.CandCache)
    if use_analytic:
        from pin_slam_tpu.slam import tracker_grad as tg

        r_max = jnp.max(jnp.where(source_valid,
                                  jnp.linalg.norm(source, axis=-1), 0.0))
        probe_margin = 0.25 * mc.voxel_size

        def probe(R, t):
            return tg.probe_candidates(
                lm, mc, source @ R.T + t + origin, offsets)

    def cond(carry):
        R, t, i, converged, valid, last_res = carry[:6]
        return (i < tc.reg_iter_n) & ~converged & valid

    def body(carry):
        if use_analytic:
            # NESTED-loop cache refresh (r5): the probe lives in the OUTER
            # loop only — the former in-body lax.cond refresh made every GN
            # iteration pay the full probe (~10 ms/iter at run_kitti shapes;
            # measured: the per-iteration cost didn't move when the dense
            # math shrank 5x, the signature of both-branch execution)
            R, t, i, converged, valid, last_res, cache, pR, pt = carry
            N, g, res_cm, valid_count = one_step(R, t, cache)
        else:
            R, t, i, converged, valid, last_res = carry
            N, g, res_cm, valid_count = one_step(R, t)
        xi = solve(N, g)
        # trust region: an ill-conditioned normal-equation solve can return an
        # enormous step, and Rodrigues at huge f32 angles loses orthonormality
        w_norm = jnp.linalg.norm(xi[:3])
        v_norm = jnp.linalg.norm(xi[3:])
        scale = jnp.minimum(1.0, jnp.minimum(0.5 / jnp.maximum(w_norm, 1e-12),
                                             2.0 / jnp.maximum(v_norm, 1e-12)))
        xi = xi * scale
        dR = so3_expmap(xi[:3])
        dt = xi[3:]
        R_new = dR @ R
        t_new = dR @ t + dt                          # delta acts on the left: p' = dR p + dt
        # keep R on SO(3): f32 product drift compounds over reg_iter_n iters
        from pin_slam_tpu.ops.transforms import quat_to_rotmat, rotmat_to_quat
        R_new = quat_to_rotmat(rotmat_to_quat(R_new))

        # health gates (ref utils/tracker.py:115-135)
        grew = (res_cm - last_res) / jnp.maximum(last_res, 1e-9) > tc.max_increment_ratio
        enough = ((valid_count >= tc.min_valid_points)
                  & (valid_count.astype(jnp.float32) / src_count.astype(jnp.float32)
                     >= tc.min_valid_ratio))
        valid = valid & ~grew & enough
        last_res = jnp.where(grew, last_res, res_cm)

        rot_deg = jnp.degrees(jnp.arccos(jnp.clip((jnp.trace(dR) - 1) / 2, -1.0, 1.0)))
        tran_m = jnp.linalg.norm(dt)
        converged = (rot_deg < tc.term_thre_deg) & (tran_m < tc.term_thre_m)

        if use_analytic:
            return (R_new, t_new, i + 1, converged, valid, last_res, cache, pR, pt)
        return (R_new, t_new, i + 1, converged, valid, last_res)

    R0 = R_init.astype(jnp.float32)
    t0 = t_init.astype(jnp.float32)
    init = (R0, t0,
            jnp.zeros((), jnp.int32), jnp.zeros((), bool), jnp.ones((), bool),
            jnp.full((), 1e5, jnp.float32))
    if use_analytic:
        # outer loop: ONE probe per refresh epoch; inner loop: pure dense GN
        # iterations until converged/invalid OR the pose has moved far enough
        # that the probed cell neighborhoods could have changed
        def inner_cond(carry):
            R, t, i, converged, valid, last_res, cache, pR, pt = carry
            moved = (jnp.linalg.norm(t - pt)
                     + jnp.linalg.norm(R - pR) * r_max)
            return ((i < tc.reg_iter_n) & ~converged & valid
                    & (moved <= probe_margin))

        def outer_cond(carry):
            return cond(carry[:6])

        def outer_body(carry):
            R, t, i, converged, valid, last_res = carry[:6]
            cache = carry[6]                  # probed at (R, t) by the
            inner = jax.lax.while_loop(       # previous epoch's tail (or init)
                inner_cond, body,
                (R, t, i, converged, valid, last_res, cache, R, t))
            R2, t2 = inner[0], inner[1]
            # next epoch's (or the final-statistics query's) cache, probed at
            # the advanced pose — every probe is consumed exactly once
            return inner[:6] + (probe(R2, t2),)

        out = jax.lax.while_loop(outer_cond, outer_body,
                                 init + (probe(R0, t0),))
    else:
        out = jax.lax.while_loop(cond, body, init)
    R, t, i, converged, valid, last_res = out[:6]

    # re-orthonormalize: f32 drift through up to reg_iter_n matrix products
    # leaves det(R) != 1; if the caller chains poses frame-to-frame the scale
    # error COMPOUNDS multiplicatively (observed det 1.01 -> 8.2 over 7 frames)
    from pin_slam_tpu.ops.transforms import quat_to_rotmat, rotmat_to_quat
    R = quat_to_rotmat(rotmat_to_quat(R))

    # final statistics at the converged pose (ref utils/tracker.py:137-167);
    # the last refresh epoch's candidate cache is valid within the probe
    # margin of the converged pose, so no fresh full-template query is needed
    if use_analytic:
        N, g, res_cm, valid_count = one_step(R, t, out[6])
    else:
        N, g, res_cm, valid_count = one_step(R, t)
    max_final_res_cm = tc.surface_sample_range * 0.5 * 100.0
    valid = valid & (res_cm <= max_final_res_cm)

    N_tran = N[3:, 3:]
    min_eig = smallmat.sym_eigvals_min3(N_tran)
    if tc.eigenvalue_check:
        valid = valid & (min_eig >= valid_count.astype(jnp.float32) * tc.eigenvalue_ratio_thre)

    # covariance estimate (ref utils/tracker.py:521-536): inv(N) * weighted mse
    mse = (res_cm / 100.0) ** 2
    cov = smallmat.cholesky_inverse6(N + 1e-6 * jnp.eye(6, dtype=N.dtype)) * mse

    return TrackResult(R=R, t=t, valid=valid, converged=converged, iterations=i,
                       sdf_residual_cm=res_cm, valid_count=valid_count,
                       min_eigenvalue=min_eig, cov=cov)


@partial(jax.jit, static_argnames=("mc", "tc"))
def query_source_points(lm: npts.LocalMap, mc: npts.MapConfig,
                        tc: TrackerConfig, geo_params: dec.DecoderParams, sdf_scale: float,
                        offsets: jax.Array, pts_world: jax.Array):
    """Standalone SDF + gradient + mask query (ref utils/tracker.py:176-275) —
    used by the dynamic filter, mesher and diagnostics."""
    def f(p):
        knn = npts.knn_search(lm, mc, p, offsets)
        geo_feat, _, w, cert = npts.interpolate_features(lm, mc, p, knn.lidx)
        sdf_pred, _ = dec.blended_sdf(geo_params, geo_feat, w, mc.weighted_first,
                                      sdf_scale)
        return sdf_pred, (knn.nn_count, cert)

    sdf_pred, vjp_fn, (nn_count, cert) = jax.vjp(f, pts_world, has_aux=True)
    grad = vjp_fn(jnp.ones_like(sdf_pred))[0]
    return sdf_pred, grad, nn_count, cert
