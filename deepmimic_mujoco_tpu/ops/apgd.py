"""Pallas TPU kernel for the batched APGD cone solve.

The dual contact solve iterates ``f ← proj(y − (1/L)(A y + b))`` 50 times per
forward call.  Under plain XLA the per-env matrices A (B, ne, ne) live in HBM
and are re-streamed every iteration (≈50·B·ne² reads per solve, ×4 RK4
stages).  This kernel tiles a block of envs into VMEM once and runs the whole
iteration on-chip: A is read from HBM exactly once per solve.

Semantics identical to ``physics.solver``'s scan (Nesterov momentum,
Gershgorin 1/L step, elliptic cone projection for contact 3-blocks,
clamping for limit rows).  Used when ne/nc are modest (capped constraint
sets); falls back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _project(f, mu, nc, nl):
    """Cone projection in the GROUPED layout ``[fn(nc) | ft1(nc) | ft2(nc) |
    limits(nl)]``: contact columns project onto the elliptic friction cone,
    limit columns clamp to f ≥ 0.  f: (BLK, ne); mu: (BLK, nc).

    Grouped (planar) layout instead of interleaved [n,t1,t2]-triples because
    Mosaic cannot lower (BLK, ne) → (BLK, nc, 3) vector reshapes; static lane
    slices + concat it handles fine."""
    fn = f[:, :nc]
    f1 = f[:, nc: 2 * nc]
    f2 = f[:, 2 * nc: 3 * nc]
    t = jnp.sqrt(f1 * f1 + f2 * f2 + 1e-20)
    inside = t <= mu * fn
    below = mu * t <= -fn
    fn_p = jnp.maximum((fn + mu * t) / (1.0 + mu * mu), 0.0)
    scale = jnp.where(t > 1e-12, mu * fn_p / jnp.maximum(t, 1e-12), 0.0)
    fn_out = jnp.where(inside, jnp.maximum(fn, 0.0), fn_p)
    f1_out = jnp.where(inside, f1, f1 * scale)
    f2_out = jnp.where(inside, f2, f2 * scale)
    zero = jnp.zeros_like(fn)
    fn_out = jnp.where(below, zero, fn_out)
    f1_out = jnp.where(below, zero, f1_out)
    f2_out = jnp.where(below, zero, f2_out)
    fl = jnp.maximum(f[:, 3 * nc:], 0.0)
    return jnp.concatenate([fn_out, f1_out, f2_out, fl], axis=-1)


def _group_perm(nc: int, nl: int):
    """Permutation grouped→interleaved: ``x_grouped = x_interleaved[perm]``.
    Grouped index g maps to interleaved row perm[g]."""
    import numpy as np

    perm = np.concatenate([
        np.arange(nc) * 3,          # normals
        np.arange(nc) * 3 + 1,      # tangent 1
        np.arange(nc) * 3 + 2,      # tangent 2
        3 * nc + np.arange(nl),     # limits
    ]).astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int32)
    return perm, inv


def _apgd_kernel(a_ref, b_ref, mu_ref, f0_ref, f_ref, *, iterations, nc, nl):
    # A may be stored bf16 (solver_dtype) — the HBM→VMEM copy moves the
    # half-width buffer; compute in f32 on-chip
    a = a_ref[:].astype(jnp.float32)   # (BLK, ne, ne)
    b = b_ref[:]          # (BLK, ne)
    mu = mu_ref[:]        # (BLK, nc)
    lip = jnp.max(jnp.sum(jnp.abs(a), axis=-1), axis=-1)  # (BLK,)
    step = (1.0 / jnp.maximum(lip, 1e-8))[:, None]

    def body(i, carry):
        f, y, t = carry
        g = jax.lax.dot_general(
            a, y[..., None],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[..., 0] + b
        f_new = _project(y - step * g, mu, nc, nl)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = f_new + ((t - 1.0) / t_new) * (f_new - f)
        return f_new, y_new, t_new

    f0 = _project(f0_ref[:], mu, nc, nl)   # warm start (zeros when cold)
    f, _, _ = jax.lax.fori_loop(
        0, iterations, body, (f0, f0, jnp.asarray(1.0, jnp.float32)))
    f_ref[:] = f


def _project_lanes(f, mu, nc, nl):
    """Cone projection in the lane-major grouped layout: f (ne, BLK) with
    rows [fn(nc) | ft1(nc) | ft2(nc) | limits(nl)], mu (nc, BLK).  All ops
    are (sublane, lane) tiles — the layout the VPU vectorizes natively."""
    fn = f[:nc]
    f1 = f[nc: 2 * nc]
    f2 = f[2 * nc: 3 * nc]
    t = jnp.sqrt(f1 * f1 + f2 * f2 + 1e-20)
    inside = t <= mu * fn
    below = mu * t <= -fn
    fn_p = jnp.maximum((fn + mu * t) / (1.0 + mu * mu), 0.0)
    scale = jnp.where(t > 1e-12, mu * fn_p / jnp.maximum(t, 1e-12), 0.0)
    fn_out = jnp.where(inside, jnp.maximum(fn, 0.0), fn_p)
    f1_out = jnp.where(inside, f1, f1 * scale)
    f2_out = jnp.where(inside, f2, f2 * scale)
    zero = jnp.zeros_like(fn)
    fn_out = jnp.where(below, zero, fn_out)
    f1_out = jnp.where(below, zero, f1_out)
    f2_out = jnp.where(below, zero, f2_out)
    fl = jnp.maximum(f[3 * nc:], 0.0)
    return jnp.concatenate([fn_out, f1_out, f2_out, fl], axis=0)


def _apgd_kernel_lanes(a_ref, b_ref, mu_ref, f0_ref, f_ref, *,
                       iterations, nc, nl):
    """Lane-major APGD block: env batch in the 128-lane axis.

    a: (ne, ne, BLK), b: (ne, BLK), mu: (nc, BLK).  The per-env matvec
    g[i, e] = Σ_j a[i, j, e]·y[j, e] becomes a broadcast-multiply +
    sublane reduction of (ne, BLK) tiles — fully vectorized on the VPU,
    with A resident in VMEM across all iterations (read from HBM once per
    solve instead of once per iteration)."""
    a = a_ref[:].astype(jnp.float32)   # bf16 storage supported (solver_dtype)
    b = b_ref[:]
    mu = mu_ref[:]
    lip = jnp.max(jnp.sum(jnp.abs(a), axis=1), axis=0)      # (BLK,)
    step = (1.0 / jnp.maximum(lip, 1e-8))[None, :]           # (1, BLK)

    def body(i, carry):
        f, y, t = carry
        g = jnp.sum(a * y[None, :, :], axis=1) + b           # (ne, BLK)
        f_new = _project_lanes(y - step * g, mu, nc, nl)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = f_new + ((t - 1.0) / t_new) * (f_new - f)
        return f_new, y_new, t_new

    f0 = _project_lanes(f0_ref[:], mu, nc, nl)   # warm start
    f, _, _ = jax.lax.fori_loop(
        0, iterations, body, (f0, f0, jnp.asarray(1.0, jnp.float32)))
    f_ref[:] = f


@functools.partial(jax.jit, static_argnames=("iterations", "nc", "nl",
                                             "block", "interpret"))
def apgd_solve_lanes(a: jnp.ndarray, b: jnp.ndarray, mu: jnp.ndarray,
                     f0: jnp.ndarray, *,
                     iterations: int, nc: int, nl: int, block: int = 128,
                     interpret: bool = False) -> jnp.ndarray:
    """Batched APGD in lane-major grouped layout: a (ne, ne, B), b (ne, B),
    mu (nc, B), f0 (ne, B) → f (ne, B).  B must be a multiple of ``block``."""
    ne = a.shape[0]
    B = a.shape[-1]
    assert B % block == 0, f"batch {B} not divisible by block {block}"
    grid = (B // block,)
    kernel = functools.partial(_apgd_kernel_lanes, iterations=iterations,
                               nc=nc, nl=nl)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ne, B), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ne, ne, block), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ne, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ne, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ne, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, b, mu, f0)


def _apgd_scan(a, b, mu, f0, *, iterations, nc, nl):
    """Per-env reference implementation (XLA scan) — also the grad-safe and
    CPU path.  Takes the INTERLEAVED [n,t1,t2]-triple layout and permutes to
    the grouped layout internally (pure relabeling — identical iterates).
    ``f0`` warm-starts the iteration (pass zeros for a cold solve)."""
    perm, inv = _group_perm(nc, nl)
    a = a[perm][:, perm]
    b = b[perm]
    # A may arrive in bf16 (PhysicsModel.solver_dtype) — the Lipschitz
    # bound must accumulate in f32 (a bf16 row-sum could round low and
    # overshoot the 1/L step); the matvec promotes to f32 on its own
    lip = jnp.max(jnp.sum(jnp.abs(a).astype(jnp.float32), axis=-1))
    step = 1.0 / jnp.maximum(lip, 1e-8)

    def project(f):
        return _project(f[None], mu[None], nc, nl)[0]

    def iteration(carry, _):
        f, y, t = carry
        g = jnp.matmul(a.astype(jnp.float32), y) + b
        f_new = project(y - step * g)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = f_new + ((t - 1.0) / t_new) * (f_new - f)
        return (f_new, y_new, t_new), None

    f0 = project(f0[perm])
    from deepmimic_mujoco_tpu.utils.unroll import unroll_for

    (f, _, _), _ = jax.lax.scan(
        iteration, (f0, f0, jnp.asarray(1.0, b.dtype)), None,
        length=iterations, unroll=unroll_for("solver", iterations))
    return f[inv]


@functools.lru_cache(maxsize=None)
def make_apgd(iterations: int, nc: int, nl: int, use_pallas: bool,
              block: int = 0, interpret: bool = False,
              layout: str | None = None):
    """Per-env APGD solve ``(a (ne,ne), b (ne), mu (nc)) → f (ne)`` whose
    vmap dispatches to the batched Pallas kernel (when ``use_pallas``).

    ``layout``: 'lanes' (default) = env batch in the 128-lane axis — the
    matvec vectorizes as (sublane, lane) VPU tiles with A VMEM-resident;
    'blocks' = the r1 kernel (envs in the leading axis, batched
    dot_general).  Override with DMTPU_PALLAS_LAYOUT."""
    import os

    from jax.custom_batching import custom_vmap

    if layout is None:
        layout = os.environ.get("DMTPU_PALLAS_LAYOUT", "lanes")
    if not block:
        block = 128 if layout == "lanes" else 8

    scan_impl = functools.partial(_apgd_scan, iterations=iterations,
                                  nc=nc, nl=nl)
    fn = custom_vmap(scan_impl)

    @fn.def_vmap
    def _rule(axis_size, in_batched, a, b, mu, f0):
        # constants (e.g. the zeros cold-start f0) arrive unbatched —
        # broadcast them to the batch rather than requiring callers to
        def bcast(x, batched):
            return x if batched else jnp.broadcast_to(
                x, (axis_size,) + x.shape)

        a = bcast(a, in_batched[0])
        b = bcast(b, in_batched[1])
        mu = bcast(mu, in_batched[2])
        f0 = bcast(f0, in_batched[3])
        if not use_pallas:
            return jax.vmap(scan_impl)(a, b, mu, f0), True
        B = a.shape[0]
        pad = (-B) % block
        if pad:
            ne = a.shape[-1]
            a = jnp.concatenate(
                [a, jnp.broadcast_to(jnp.eye(ne, dtype=a.dtype), (pad, ne, ne))])
            b = jnp.concatenate([b, jnp.zeros((pad, ne), b.dtype)])
            mu = jnp.concatenate([mu, jnp.ones((pad, nc), mu.dtype)])
            f0 = jnp.concatenate([f0, jnp.zeros((pad, f0.shape[-1]), f0.dtype)])
        # interleaved → grouped layout (the kernel's projection works on
        # [fn | ft1 | ft2 | limits] planes; Mosaic can't reshape to triples)
        perm, inv = _group_perm(nc, nl)
        a = a[:, perm][:, :, perm]
        b = b[:, perm]
        f0 = f0[:, perm]
        if layout == "lanes":
            out = apgd_solve_lanes(
                jnp.transpose(a, (1, 2, 0)), b.T, mu.T, f0.T,
                iterations=iterations, nc=nc, nl=nl, block=block,
                interpret=interpret)
            return out.T[:B, inv], True
        out = apgd_solve(a, b, mu, f0, iterations=iterations, nc=nc, nl=nl,
                         block=block, interpret=interpret)
        return out[:B, inv], True

    return fn


@functools.partial(jax.jit, static_argnames=("iterations", "nc", "nl",
                                             "block", "interpret"))
def apgd_solve(a: jnp.ndarray, b: jnp.ndarray, mu: jnp.ndarray,
               f0: jnp.ndarray, *,
               iterations: int, nc: int, nl: int, block: int = 8,
               interpret: bool = False) -> jnp.ndarray:
    """Batched APGD solve in the GROUPED constraint layout
    ``[fn(nc) | ft1(nc) | ft2(nc) | limits(nl)]`` (see ``_group_perm``).

    a: (B, ne, ne); b: (B, ne); mu: (B, nc); f0: (B, ne) → f (B, ne).
    B must be a multiple of ``block`` (callers pad)."""
    B, ne, _ = a.shape
    assert B % block == 0, f"batch {B} not divisible by block {block}"
    grid = (B // block,)
    kernel = functools.partial(_apgd_kernel, iterations=iterations, nc=nc, nl=nl)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, ne), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, ne, ne), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, ne), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, nc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, ne), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, ne), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, b, mu, f0)
