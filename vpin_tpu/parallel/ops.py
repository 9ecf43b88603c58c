"""shard_map'd prover kernels.

TPU-native equivalents of the reference's in-process parallelism
(SURVEY.md section 2.4):

  * Hyrax row commits (rayon par_iter, Spartan/src/dense_mlpoly.rs:160-175)
    -> MSM digit rows sharded over the mesh, digit table replicated;
  * sumcheck round partial sums (the serial inner loops of
    Spartan/src/sumcheck.rs) -> eval tables laid out (2, n/2) and sharded
    over the half axis, per-device partials tree-summed exactly;
  * R1CS multiply_vec (r1csinstance.rs:272-286) -> constraint rows sharded,
    z replicated;
  * bound_poly_var_top (dense_mlpoly.rs:229-238) -> elementwise over the
    sharded half axis.

Every entry point returns None when no mesh is active or the shape does
not divide, and the caller falls back to the single-device jit — results
are bit-identical either way (field sums are associative mod l and the
partial combine is an exact modular tree-sum, not a float psum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..field.prime_field import FQ
from .mesh import AXIS, get_mesh, mesh_axis_size


def _shardable(n: int, min_per_dev: int = 1) -> bool:
    nd = mesh_axis_size()
    return nd > 1 and n % nd == 0 and n // nd >= min_per_dev


# ----------------------------------------------------------------------
# Hyrax / Pedersen MSM rows
# ----------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _msm_row_kernel(mesh, group, n_pad: int, rows: int):
    from ..curve.msm import MSM_CHUNK_ELEMS, _msm_body

    nd = mesh.shape[AXIS]
    local_rows = rows // nd
    rp = max(1, MSM_CHUNK_ELEMS // n_pad)
    while rp > 1 and local_rows % rp:
        rp //= 2

    def local(table, digits):                       # digits (local, n, 32)
        if local_rows <= rp:
            return _msm_body(group, table, digits, vary=(AXIS,))
        resh = digits.reshape(local_rows // rp, rp, n_pad, 32)

        def body(carry, d):
            return carry, _msm_body(group, table, d, vary=(AXIS,))

        _, outs = jax.lax.scan(body, 0, resh)       # (chunks, rp) points
        return type(table)(*(c.reshape(local_rows, 16) for c in outs))

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, None), P(AXIS, None, None)),
        out_specs=P(AXIS, None))
    return jax.jit(fn)


def sharded_msm_digits(group, table, digits):
    """digits (rows, n_pad, 32) -> (rows,) PointE, rows sharded; or None."""
    mesh = get_mesh()
    rows = digits.shape[0]
    if mesh is None or not _shardable(rows):
        return None
    n_pad = table.x.shape[1]
    return _msm_row_kernel(mesh, group, n_pad, rows)(table, digits)


# ----------------------------------------------------------------------
# sumcheck round partial sums
# ----------------------------------------------------------------------

@functools.lru_cache(maxsize=128)
def _round_kernel(mesh, partial_fn, n_tables: int, n2: int):
    from ..sumcheck.sumcheck import ROUND_CHUNK

    nd = mesh.shape[AXIS]
    local_n = n2 // nd
    n_evals = 2 if n_tables == 2 else 3

    def local(*resh):                               # each (2, n2/nd, 16)
        los = tuple(t[0] for t in resh)
        his = tuple(t[1] for t in resh)
        if local_n <= ROUND_CHUNK:
            evs = partial_fn(los, his)              # tuple of (16,) partials
        else:
            k = local_n // ROUND_CHUNK
            ch = tuple(t.reshape(k, ROUND_CHUNK, 16) for t in los + his)

            def body(carry, xs):
                e = partial_fn(xs[:n_tables], xs[n_tables:])
                return tuple(FQ.add(c, v) for c, v in zip(carry, e)), None

            init = tuple(jax.lax.pcast(FQ.zeros(()), (AXIS,), to="varying")
                         for _ in range(n_evals))
            evs, _ = jax.lax.scan(body, init, ch)
        return jnp.stack(evs, axis=0)[None]         # (1, nev, 16)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=tuple(P(None, AXIS, None) for _ in range(n_tables)),
        out_specs=P(AXIS, None, None))
    return jax.jit(fn)


def sharded_round_evals(partial_fn, tables):
    """tables: tuple of (n, 16) eval tables; partial_fn(los, his) -> tuple
    of per-shard partial sums.  Returns a tuple of (16,) device scalars
    (exact modular combine of per-device partials), or None."""
    mesh = get_mesh()
    n2 = tables[0].shape[0] // 2
    if mesh is None or not _shardable(n2):
        return None
    resh = tuple(t.reshape(2, n2, 16) for t in tables)
    parts = _round_kernel(mesh, partial_fn, len(tables), n2)(*resh)
    combined = FQ.sum_reduce(parts, axis=0)         # (nev, 16), exact mod l
    return tuple(combined[i] for i in range(combined.shape[0]))


# ----------------------------------------------------------------------
# bound_poly_var_top
# ----------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _bound_kernel(mesh, n2: int):
    def local(Z2, r_dev):                            # (2, n2/nd, 16)
        lo, hi = Z2[0], Z2[1]
        return FQ.add(lo, FQ.mul(jnp.broadcast_to(r_dev, hi.shape),
                                 FQ.sub(hi, lo)))

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, AXIS, None), P(None)),
        out_specs=P(AXIS, None))
    return jax.jit(fn)


def sharded_bound_top(Z, r_dev):
    """Z (n, 16) -> (n/2, 16) bound at r, half axis sharded; or None."""
    mesh = get_mesh()
    n2 = Z.shape[0] // 2
    if mesh is None or not _shardable(n2):
        return None
    return _bound_kernel(mesh, n2)(Z.reshape(2, n2, 16), r_dev)


# ----------------------------------------------------------------------
# R1CS multiply_vec rows
# ----------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _regular_reduce_kernel(mesh, nseg: int, k: int):
    def local(vals, idx, z):                        # (nseg/nd, k, ...)
        gathered = z[idx]
        return FQ.sum_reduce(FQ.mul(vals, gathered), axis=1)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS, None, None), P(AXIS, None), P(None, None)),
        out_specs=P(AXIS, None))
    return jax.jit(fn)


def sharded_regular_reduce(vals_mont, idx, z, nseg: int):
    """Row-sharded out[s] = sum_k vals[s,k] * z[idx[s,k]]; or None."""
    mesh = get_mesh()
    if mesh is None or not _shardable(nseg):
        return None
    return _regular_reduce_kernel(mesh, nseg, idx.shape[1])(vals_mont, idx, z)
