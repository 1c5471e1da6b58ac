"""Beneš/Clos static permutation router — edge-axis routing at VPU speed.

Applies an arbitrary *static* permutation to edge arrays using only
within-row (128-lane) gathers and minor-axis transposes:

  measured on TPU v5e, 2M elements:
    XLA arbitrary gather       ~17 ms     (element-serialized lowering)
    XLA routing sort            ~3.6 ms
    Pallas within-row gather    ~0.14 ms  <- this module's building block

A permutation over N = R*128 elements is decomposed Clos-style into
  stage1: independent within-row permutations     ([R,128] lane gather)
  middle: independent within-column permutations  (transpose + recurse)
  stage3: independent within-row permutations
The middle-stage routing assignment is a proper 128-edge-coloring of the
R x R bipartite multigraph "source row -> destination row", computed by
recursive Euler splitting in native C++ (essentials_tpu/native/route.cpp).
Depth: 1 stage for N<=128, 3 for N<=16K, 5 for N<=2M, 7 for N<=268M.

The plan is a static pytree of int32 index arrays; apply_plan() executes it
with a tiled Pallas kernel on TPU (jnp.take_along_axis elsewhere).
"""

from __future__ import annotations

import ctypes
import os
from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

LANES = 128


# ------------------------------------------------------------------ #
# native edge coloring

_SO = os.path.join(os.path.dirname(__file__), "..", "native",
                   "libetpu_route.so")
_lib = None


def _build_lib() -> bool:
    """Build the native router in place (fresh checkouts ship sources, not
    .so artifacts). One `make` invocation, serialized by an exclusive
    lockfile so parallel test workers don't race the compiler."""
    import subprocess
    native_dir = os.path.dirname(os.path.abspath(_SO))
    try:
        with open(os.path.join(native_dir, ".build.lock"), "w") as lk:
            try:
                import fcntl
                fcntl.flock(lk, fcntl.LOCK_EX)
            except ImportError:
                pass
            if not os.path.exists(_SO):
                subprocess.run(["make", "-C", native_dir], check=True,
                               capture_output=True, timeout=300)
    except subprocess.CalledProcessError as e:
        # surface compiler diagnostics instead of the generic ImportError
        tail = (e.stderr or b"").decode(errors="replace")[-2000:]
        global _build_error
        _build_error = f"`make -C {native_dir}` failed:\n{tail}"
        return False
    except Exception as e:
        _build_error = f"{type(e).__name__}: {e}"
        return False
    return os.path.exists(_SO)


_build_error = None


def _load_lib():
    global _lib
    if _lib is None:
        if not os.path.exists(_SO) and not _build_lib():
            detail = f"\n{_build_error}" if _build_error else ""
            raise ImportError(
                f"native router not built ({_SO}); "
                f"run: make -C essentials_tpu/native{detail}")
        _lib = ctypes.CDLL(_SO)
        _lib.etpu_edge_color.restype = ctypes.c_int
        _lib.etpu_edge_color.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
    return _lib


def edge_color(u: np.ndarray, v: np.ndarray, n_left: int,
               degree: int) -> np.ndarray:
    """Proper ``degree``-edge-coloring of a regular bipartite multigraph."""
    lib = _load_lib()
    u = np.ascontiguousarray(u, np.int32)
    v = np.ascontiguousarray(v, np.int32)
    colors = np.empty(u.shape[0], np.int32)
    rc = lib.etpu_edge_color(
        u.shape[0], n_left, degree,
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        colors.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        raise ValueError(f"etpu_edge_color failed with code {rc}")
    return colors


# ------------------------------------------------------------------ #
# plan construction (host, NumPy)

@partial(jax.tree_util.register_dataclass,
         data_fields=["idx1", "idx3", "leaf_idx", "mid"],
         meta_fields=["batch", "rows", "length"])
@dataclass(frozen=True)
class PermutePlan:
    """One Clos level (or a leaf) of routing indices.

    Leaf: apply ``leaf_idx`` [B, W<=128] as a within-row gather.
    Node: idx1/idx3 are [B, R, 128] stage gathers; ``mid`` is the recursive
    plan over the transposed [B*128, R] middle stage.
    """
    idx1: jax.Array | None
    idx3: jax.Array | None
    leaf_idx: jax.Array | None
    batch: int
    rows: int
    length: int
    mid: "PermutePlan | None"


def _route_np(perm: np.ndarray) -> dict:
    """perm: [B, N] gather indices (out[b,p] = in[b, perm[b,p]]); N a
    multiple of 128 with N/128 <= 128 or N/128 a multiple of 128."""
    B, N = perm.shape
    if N <= LANES:
        return {"leaf": perm.astype(np.int32)}
    R, C = N // LANES, LANES
    p = np.arange(N)
    src = perm.reshape(B, R, C)
    r_src = (perm // C).astype(np.int32)           # [B, N] source row
    c_src = (perm % C).astype(np.int32)
    r_dst = np.broadcast_to((p // C).astype(np.int32), (B, N))

    # batch graphs are disjoint: offset node ids by b*R
    off = (np.arange(B, dtype=np.int64) * R)[:, None]
    colors = edge_color((r_src + off).reshape(-1),
                        (r_dst + off).reshape(-1), B * R, C)
    m = colors.reshape(B, N).astype(np.int32)

    b_ix = np.repeat(np.arange(B), N)
    idx1 = np.empty((B, R, C), np.int32)
    idx1[b_ix, r_src.reshape(-1), m.reshape(-1)] = c_src.reshape(-1)
    idx3 = np.empty((B, R, C), np.int32)
    idx3[b_ix, r_dst.reshape(-1), (p % C)[None].repeat(B, 0).reshape(-1)] = \
        m.reshape(-1)
    # middle: per (b, column m): dest row r' sources from row r_src
    mid = np.empty((B, C, R), np.int32)
    mid[b_ix, m.reshape(-1), r_dst.reshape(-1)] = r_src.reshape(-1)
    return {"idx1": idx1, "idx3": idx3,
            "mid": _route_np(mid.reshape(B * C, R))}


def _to_plan(d: dict, batch: int, length: int) -> PermutePlan:
    # Every stage is a within-row gather of width <= 128, so all indices fit
    # int8 — 4x less plan data to ship through slow host->TPU links. Leaves
    # stay host numpy; callers batch the device transfer with ONE
    # jax.device_put over the whole pytree (per-level transfers each pay
    # round-trip latency on tunneled TPU runtimes).
    if "leaf" in d:
        return PermutePlan(idx1=None, idx3=None,
                           leaf_idx=d["leaf"].astype(np.int8),
                           batch=batch, rows=0, length=length, mid=None)
    idx1 = d["idx1"]
    B, R, C = idx1.shape
    return PermutePlan(idx1=idx1.astype(np.int8),
                       idx3=d["idx3"].astype(np.int8),
                       leaf_idx=None, batch=B, rows=R, length=R * C,
                       mid=_to_plan(d["mid"], B * C, R))


def routable_length(n: int) -> int:
    """Smallest supported padded length >= n (legacy flat executor)."""
    def up(x, m):
        return ((x + m - 1) // m) * m
    if n <= LANES:
        return LANES
    if n <= LANES * LANES:                # one Clos level, R <= 128
        return up(n, LANES)
    if n <= LANES ** 2 * LANES:           # R multiple of 128, R/128 <= 128
        return up(n, LANES * LANES)
    if n <= LANES ** 4:
        return up(n, LANES ** 3)
    raise ValueError(f"permutation too large to route: {n}")


def plan_length(n: int) -> int:
    """Padded length route_permutation(gather_idx of size n) will use —
    the cube executor's when it covers n, the legacy flat one otherwise."""
    from essentials_tpu.ops.cube_router import cube_routable_length
    L = cube_routable_length(n)
    return L if L is not None else routable_length(n)


def invert_plan(plan):
    """Host-side inverse for either plan kind."""
    from essentials_tpu.ops import cube_router
    if isinstance(plan, cube_router.CubePlan):
        return cube_router.invert_cube_plan(plan)
    return _invert_flat_plan(plan)


def _invert_flat_plan(plan: PermutePlan) -> PermutePlan:
    """Host-side inverse: apply_plan(apply_plan(x, p), invert_plan(p)) == x.

    A Clos node (stage1 -> transpose -> mid -> transpose -> stage3) inverts
    to (stage3^-1 -> transpose -> mid^-1 -> transpose -> stage1^-1); each
    stage is a batch of independent row permutations, inverted by scatter.
    """
    def inv_rows(idx):
        idx = np.asarray(idx)
        flat = idx.reshape(-1, idx.shape[-1])
        out = np.empty_like(flat)
        ar = np.arange(flat.shape[-1], dtype=flat.dtype)
        rows = np.arange(flat.shape[0])[:, None]
        out[rows, flat] = ar[None, :]
        return out.reshape(idx.shape)

    if plan.leaf_idx is not None:
        return PermutePlan(idx1=None, idx3=None,
                           leaf_idx=inv_rows(plan.leaf_idx),
                           batch=plan.batch, rows=plan.rows,
                           length=plan.length, mid=None)
    return PermutePlan(idx1=inv_rows(plan.idx3), idx3=inv_rows(plan.idx1),
                       leaf_idx=None, batch=plan.batch, rows=plan.rows,
                       length=plan.length, mid=invert_plan(plan.mid))


def _plan_cache_dir() -> str | None:
    d = os.environ.get("ESSENTIALS_TPU_CACHE")
    if d == "0":
        return None
    if not d:
        d = os.path.join(os.path.expanduser("~"), ".cache", "essentials_tpu")
    os.makedirs(d, exist_ok=True)
    return d


def _plan_to_store(plan: PermutePlan, store: dict, prefix: str) -> None:
    if plan.leaf_idx is not None:
        store[prefix + "leaf"] = np.asarray(plan.leaf_idx)
        return
    store[prefix + "idx1"] = np.asarray(plan.idx1)
    store[prefix + "idx3"] = np.asarray(plan.idx3)
    _plan_to_store(plan.mid, store, prefix + "m.")


def _plan_from_store(z, prefix: str, batch: int, length: int) -> PermutePlan:
    if prefix + "leaf" in z:
        leaf = z[prefix + "leaf"]
        return PermutePlan(idx1=None, idx3=None, leaf_idx=leaf,
                           batch=batch, rows=0, length=length, mid=None)
    idx1 = z[prefix + "idx1"]
    B, R, C = idx1.shape
    return PermutePlan(idx1=idx1, idx3=z[prefix + "idx3"], leaf_idx=None,
                       batch=B, rows=R, length=R * C,
                       mid=_plan_from_store(z, prefix + "m.", B * C, R))


def route_permutation(gather_idx: np.ndarray, *, cache: bool = True
                      ) -> PermutePlan:
    """Build a routing plan for ``out[p] = in[gather_idx[p]]`` (a bijection
    over [0, n)). The plan pads to routable_length(n) internally.

    Plans are content-addressed-cached on disk (~/.cache/essentials_tpu or
    $ESSENTIALS_TPU_CACHE; "0" disables) — reference parity with the CSR
    binary cache idea (formats/csr.hxx:159-240), applied to routing
    preprocessing instead.
    """
    from essentials_tpu.ops import cube_router
    gather_idx = np.asarray(gather_idx, np.int64)
    n = gather_idx.shape[0]
    if cube_router.cube_routable_length(n) is not None:
        return _route_cube_cached(gather_idx, cache)
    np_len = routable_length(n)
    cdir = _plan_cache_dir() if cache else None
    path = None
    if cdir is not None:
        import hashlib
        h = hashlib.blake2b(gather_idx.tobytes(), digest_size=16)
        h.update(str(np_len).encode())
        path = os.path.join(cdir, f"plan_{h.hexdigest()}.npz")
        if os.path.exists(path):
            try:
                with np.load(path) as z:
                    return _plan_from_store(dict(z.items()), "", 1, np_len)
            except Exception:
                pass  # corrupt cache entry: rebuild
    full = np.concatenate([gather_idx,
                           np.arange(n, np_len, dtype=np.int64)])
    d = _route_np(full[None, :])
    plan = _to_plan(d, 1, np_len)
    if path is not None:
        store: dict = {}
        _plan_to_store(plan, store, "")
        _atomic_savez(path, store)
    return plan


def _atomic_savez(path: str, store: dict) -> None:
    """Best-effort atomic cache write; concurrent writers may race on the
    temp file (same pid across containers, cleanup crossfire) — losing a
    cache entry is fine, failing the computation is not."""
    tmp = path + f".tmp{os.getpid()}.npz"
    try:
        np.savez(tmp, **store)
        os.replace(tmp, path)
    except OSError:
        try:
            os.unlink(tmp)
        except OSError:
            pass


def _route_cube_cached(gather_idx: np.ndarray, cache: bool):
    """Build (or load) a fused-kernel CubePlan (ops/cube_router.py)."""
    from essentials_tpu.ops import cube_router
    L = cube_router.cube_routable_length(gather_idx.shape[0])
    cdir = _plan_cache_dir() if cache else None
    path = None
    if cdir is not None:
        import hashlib
        h = hashlib.blake2b(gather_idx.tobytes(), digest_size=16)
        h.update(f"cube2:{L}".encode())
        path = os.path.join(cdir, f"cplan_{h.hexdigest()}.npz")
        if os.path.exists(path):
            try:
                with np.load(path) as z:
                    meta = z["meta"]
                    stages = tuple(z[f"s{i}"] for i in range(int(meta[0])))
                    return cube_router.CubePlan(
                        stages=stages, form=str(z["form"]),
                        length=int(meta[1]), wide=int(meta[2]))
            except Exception:
                pass
    plan = cube_router.build_cube_plan(gather_idx)
    if path is not None:
        store = {f"s{i}": np.asarray(a) for i, a in enumerate(plan.stages)}
        store["meta"] = np.asarray(
            [len(plan.stages), plan.length, plan.wide], np.int64)
        store["form"] = np.asarray(plan.form)
        _atomic_savez(path, store)
    return plan


# ------------------------------------------------------------------ #
# device application

_ROW_TILE = 1024


def _pallas_rowgather(x2: jax.Array, idx2: jax.Array) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, w = x2.shape

    def kernel(idx_ref, x_ref, out_ref):
        idx = idx_ref[:, :].astype(jnp.int32)   # plans ship int8 indices
        out_ref[:, :] = jnp.take_along_axis(x_ref[:, :], idx, axis=1)

    tr = min(_ROW_TILE, rows)
    while rows % tr:
        tr //= 2
    return pl.pallas_call(
        kernel,
        grid=(rows // tr,),
        in_specs=[pl.BlockSpec((tr, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((tr, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, w), x2.dtype),
    )(idx2, x2)


def _rowgather(x2: jax.Array, idx2: jax.Array, use_pallas: bool) -> jax.Array:
    if use_pallas:
        dt = x2.dtype
        if dt in (jnp.bool_, jnp.int8, jnp.int16):
            return _pallas_rowgather(x2.astype(jnp.int32), idx2).astype(dt)
        return _pallas_rowgather(x2, idx2)
    return jnp.take_along_axis(x2, idx2, axis=1)


def _bcast_idx(idx: jax.Array, p: int) -> jax.Array:
    """Tile a [B, ...] index array to [p*B, ...] for payload batching."""
    if p == 1:
        return idx
    return jnp.broadcast_to(idx[None], (p,) + idx.shape).reshape(
        (p * idx.shape[0],) + idx.shape[1:])


def _apply(x: jax.Array, plan: PermutePlan, use_pallas: bool,
           p: int = 1) -> jax.Array:
    """x: [p*B, N] -> permuted [p*B, N] (same plan per payload slice)."""
    if plan.leaf_idx is not None:
        idx = _bcast_idx(plan.leaf_idx, p)
        w = idx.shape[1]
        if use_pallas and w < LANES:
            # Pack k narrow rows into one 128-lane row so the lane gather
            # runs at full width (w=4 leaves would otherwise waste 32x).
            B = idx.shape[0]
            k = 1
            while k * 2 * w <= LANES and B % (k * 2) == 0:
                k *= 2
            if k > 1:
                base = (jnp.arange(k, dtype=idx.dtype) * w
                        ).repeat(w)[None, :]                   # [1, k*w]
                xp = x.reshape(B // k, k * w)
                ip = idx.reshape(B // k, k * w) + base
                pad = LANES - k * w
                if pad:
                    xp = jnp.pad(xp, ((0, 0), (0, pad)))
                    ip = jnp.pad(ip, ((0, 0), (0, pad)))
                out = _rowgather(xp, ip, True)[:, :k * w]
                return out.reshape(B, w)
            xp = jnp.pad(x, ((0, 0), (0, LANES - w)))
            ip = jnp.pad(idx, ((0, 0), (0, LANES - w)))
            return _rowgather(xp, ip, True)[:, :w]
        return _rowgather(x, idx, use_pallas)
    B, R, C = plan.idx1.shape
    pb = p * B
    x = x.reshape(pb, R, C)
    x1 = _rowgather(x.reshape(pb * R, C),
                    _bcast_idx(plan.idx1, p).reshape(pb * R, C),
                    use_pallas).reshape(pb, R, C)
    t = jnp.swapaxes(x1, 1, 2)                       # [pb, C, R]
    t2 = _apply(t.reshape(pb * C, R), plan.mid, use_pallas, p)
    t3 = jnp.swapaxes(t2.reshape(pb, C, R), 1, 2)    # [pb, R, C]
    out = _rowgather(t3.reshape(pb * R, C),
                     _bcast_idx(plan.idx3, p).reshape(pb * R, C), use_pallas)
    return out.reshape(pb, R * C)


def apply_plan(x: jax.Array, plan: PermutePlan, n_valid: int | None = None,
               *, use_pallas: bool | None = None,
               pre_scan_exclusive: bool = False,
               post_scan: bool = False) -> jax.Array:
    """Apply the routed permutation to a 1-D payload array.

    ``x`` may be shorter than the plan's padded length (it is zero-padded;
    pad slots route to pad slots). Returns the first ``n_valid`` (default
    len(x)) elements of the permuted array.
    """
    return apply_plan_multi((x,), plan, n_valid, use_pallas=use_pallas,
                            pre_scan_exclusive=pre_scan_exclusive,
                            post_scan=post_scan)[0]


def apply_plan_multi(xs, plan: PermutePlan, n_valid: int | None = None,
                     *, use_pallas: bool | None = None,
                     pre_scan_exclusive: bool = False,
                     post_scan: bool = False):
    """Apply the routed permutation to several payloads at once (they ride
    the same kernels as a batch dimension). All payloads are cast to a
    common 32-bit carrier via bitcast/zero-extension and restored.

    pre_scan_exclusive / post_scan fuse an int32 wrap-around cumsum into
    the routing kernels (before/after the permutation respectively);
    scanned outputs come back as raw int32 prefix arrays."""
    from essentials_tpu.ops import cube_router
    if isinstance(plan, cube_router.CubePlan):
        return cube_router.apply_cube_plan(
            xs, plan, n_valid, use_pallas=use_pallas,
            pre_scan_exclusive=pre_scan_exclusive, post_scan=post_scan)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    n = xs[0].shape[0]
    n_valid = n if n_valid is None else n_valid
    np_len = plan.length
    dtypes_in = [x.dtype for x in xs]
    scans = pre_scan_exclusive or post_scan
    scan_f32 = scans and all(jnp.issubdtype(d, jnp.floating)
                             for d in dtypes_in)

    def _sc(v, f):
        if scan_f32:
            v = jax.lax.bitcast_convert_type(v, jnp.float32)
        v = f(v)
        if scan_f32:
            v = jax.lax.bitcast_convert_type(v, jnp.int32)
        return v

    carriers = []
    for x in xs:
        if x.dtype in (jnp.float32, jnp.uint32):
            x = jax.lax.bitcast_convert_type(x, jnp.int32)
        elif x.dtype != jnp.int32:
            x = x.astype(jnp.int32)
        if n < np_len:
            x = jnp.pad(x, (0, np_len - n))
        if pre_scan_exclusive:      # scan the padded domain (pads are 0)
            x = _sc(x, lambda v: jnp.concatenate(
                [jnp.zeros(1, v.dtype), jnp.cumsum(v)])[:-1])
        carriers.append(x)
    stacked = jnp.stack(carriers)                    # [P, np_len]
    out = _apply(stacked, plan, use_pallas, p=len(xs))
    if post_scan:
        out = _sc(out, lambda v: jnp.cumsum(v, axis=1))
    if scans:
        if scan_f32:
            return tuple(jax.lax.bitcast_convert_type(
                out[i, :n_valid], jnp.float32) for i in range(len(xs)))
        return tuple(out[i, :n_valid] for i in range(len(xs)))
    results = []
    for i, dt in enumerate(dtypes_in):
        o = out[i, :n_valid]
        if dt in (jnp.float32, jnp.uint32):
            o = jax.lax.bitcast_convert_type(o, dt)
        elif dt == jnp.bool_:
            o = o != 0
        elif dt != jnp.int32:
            o = o.astype(dt)
        results.append(o)
    return tuple(results)
