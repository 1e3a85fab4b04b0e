"""Weight-only int8/int4 quantization.

Reference tiers (mingunivisioninfer.py:46-78, README VRAM 44/22/14 GB): int8 via
optimum-quanto, int4 via bitsandbytes NF4. TPU equivalent: symmetric per-channel
int8 weights dequantized inside the matmul read — XLA fuses convert+scale into
the weight stream, so HBM traffic (the decode bottleneck) halves while compute
stays bf16 on the MXU. int4 is packed two-nibbles-per-byte with the same scheme.

int4 ships TWO numerics schemes:
  - "linear" (default): symmetric offset-binary in [-7, 7] — the layout the
    integer-MXU Pallas kernels consume (serving speed tier).
  - "nf4": the bitsandbytes NormalFloat4 nonlinear codebook the reference's
    int4 tier actually uses (mingunivisioninfer.py:47-56) — 16 quantiles of a
    standard normal, looked up at dequant and scaled by the per-channel absmax.
    Granularity deviation vs bnb: per-OUTPUT-CHANNEL absmax instead of flat
    block-64, matching this repo's scale layout (measured lower RMS error on
    normal weights than the linear scheme either way — tests/test_quantize.py).
    NF4 tables ride the dequant-fused XLA paths; the integer-dot kernels
    require "linear" and their `*_supported` gates check the scheme.

`QuantizedArray` is a pytree leaf-pair; every weight consumer goes through
`dequant_weight` / `take_weight` so quantized and full-precision params are
interchangeable everywhere (models, engine, sharding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class QuantizedArray:
    """Pytree container: (q, s) are children, `bits`/`groups` are static aux —
    so `lax.scan` can unstack layer-stacked quantized weights without touching
    a 0-d metadata leaf.

    `groups` (int4 only, default 1): number of contiguous split-halves pack
    groups along the contraction dim. groups == G means the contraction dim was
    divided into G equal blocks and each block packed independently (pair i
    with i + n/(2G) inside its block). Used for SHARD-LOCAL packing: with
    groups == model-mesh-size, a contiguous model-axis shard of the packed rows
    is itself a valid single-group packed table, so the Pallas int4 kernels run
    unchanged on each device's local shard (parallel/moe_shard.py)."""

    __slots__ = ("q", "s", "bits", "groups", "scheme")

    def __init__(self, q, s, bits: int = 8, groups: int = 1, scheme: str = "linear"):
        self.q = q
        self.s = s
        self.bits = int(bits) if not hasattr(bits, "dtype") else int(bits)
        self.groups = int(groups)
        self.scheme = str(scheme)

    def tree_flatten(self):
        return (self.q, self.s), (self.bits, self.groups, self.scheme)

    @classmethod
    def tree_unflatten(cls, aux, children):
        if isinstance(aux, tuple):
            if len(aux) == 3:
                bits, groups, scheme = aux
            else:  # pre-`scheme` layout
                (bits, groups), scheme = aux, "linear"
        else:  # aux written by the pre-`groups` layout (old checkpoints)
            bits, groups, scheme = aux, 1, "linear"
        return cls(children[0], children[1], bits, groups, scheme)

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):
        return self.q.dtype

    def __repr__(self):
        return f"QuantizedArray(shape={getattr(self.q, 'shape', '?')}, bits={self.bits})"


def _scale_axes(ndim: int):
    """Per-output-channel scales: reduce over the CONTRACTION axis, which in all
    our layouts — (in, out), (E, in, out), layer-stacked (L, E, in, out) — is the
    second-to-last axis."""
    return ndim - 2


# The 16 NormalFloat4 code values (quantiles of N(0,1) normalized to [-1, 1];
# the bitsandbytes/QLoRA NF4 data type the reference's int4 tier loads with,
# mingunivisioninfer.py:47-56).
NF4_CODE = np.asarray(
    [
        -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
        -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
        0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
        0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
        0.7229568362236023, 1.0,
    ],
    np.float32,
)
_NF4_MID = (NF4_CODE[1:] + NF4_CODE[:-1]) / 2.0  # bucket boundaries for encode


def quantize_array(w, bits: int = 8, groups: int = 1, scheme: str = "linear") -> QuantizedArray:
    """Per-channel quantization; int4 packs two nibbles per byte along the
    contraction axis.

    scheme="linear" (default): symmetric offset-binary, values in [-7, 7] —
    the layout the integer-MXU kernels consume.
    scheme="nf4" (int4 only): nibble = index into the NF4 codebook, scale =
    per-channel absmax (codebook max is 1.0) — the reference's bnb-NF4 numerics.

    int4 packing pairs element i with element i + n/2 ("split-halves"): the low
    nibble plane IS rows [0, n/2), the high plane rows [n/2, n) — unpacking is a
    concat, and the fused Pallas MoE kernel needs only contiguous slices of the
    activations (no lane/sublane interleave on the TPU hot path).

    groups > 1 (int4): pack each of `groups` contiguous contraction blocks
    independently (shard-local packing — see QuantizedArray docstring).
    """
    w = jnp.asarray(w, jnp.float32)
    ax = _scale_axes(w.ndim)
    amax = jnp.max(jnp.abs(w), axis=ax, keepdims=True)
    if scheme == "nf4":
        assert bits == 4, "nf4 is a 4-bit scheme"
        s = jnp.maximum(amax, 1e-8)
        # nearest-codebook-entry index via the midpoint boundaries
        qo = jnp.searchsorted(jnp.asarray(_NF4_MID), (w / s)).astype(jnp.uint8)  # [0, 15]
    else:
        qmax = 127.0 if bits == 8 else 7.0
        s = jnp.maximum(amax / qmax, 1e-8)
        q = jnp.clip(jnp.round(w / s), -qmax, qmax).astype(jnp.int8)
        if bits != 4:
            return QuantizedArray(q, s.astype(jnp.float32), bits)
        qo = (q + 8).astype(jnp.uint8)  # [1, 15]
    n = w.shape[ax]
    assert n % (2 * groups) == 0, (n, groups)
    blk = n // groups
    packed = []
    for g in range(groups):
        lo = jnp.take(qo, jnp.arange(g * blk, g * blk + blk // 2), axis=ax)
        hi = jnp.take(qo, jnp.arange(g * blk + blk // 2, (g + 1) * blk), axis=ax)
        packed.append(lo | (hi << 4))
    q = jnp.concatenate(packed, axis=ax).astype(jnp.uint8) if groups > 1 else packed[0].astype(jnp.uint8)
    return QuantizedArray(q, s.astype(jnp.float32), bits, groups, scheme)


def dequant_weight(w, dtype):
    """Weight fetch: dequantize QuantizedArray or plain-cast a dense array."""
    if isinstance(w, QuantizedArray):
        if w.bits == 4:
            ax = _scale_axes(w.q.ndim)
            nf4 = getattr(w, "scheme", "linear") == "nf4"
            if nf4:
                lo = (w.q & 0xF).astype(jnp.int32)
                hi = (w.q >> 4).astype(jnp.int32)
            else:
                lo = (w.q & 0xF).astype(jnp.int8) - 8
                hi = (w.q >> 4).astype(jnp.int8) - 8
            G = w.groups
            if G == 1:
                # split-halves: low plane is the first half, high the second
                q = jnp.concatenate([lo, hi], axis=ax)
            else:
                # per-group split-halves: interleave the G lo/hi block pairs
                nb = w.q.shape[ax] // G  # packed rows per group
                parts = []
                for g in range(G):
                    idx = jnp.arange(g * nb, (g + 1) * nb)
                    parts.append(jnp.take(lo, idx, axis=ax))
                    parts.append(jnp.take(hi, idx, axis=ax))
                q = jnp.concatenate(parts, axis=ax)
            if nf4:
                vals = jnp.take(jnp.asarray(NF4_CODE), q)  # codebook lookup
                return (vals * w.s).astype(dtype)
            return (q.astype(jnp.float32) * w.s).astype(dtype)
        return (w.q.astype(jnp.float32) * w.s).astype(dtype)
    return w.astype(dtype)


def take_weight(w, idx, axis: int = 0):
    """Expert gather that works on quantized or dense stacked weights.

    A size-1 (broadcast) scale axis is left untouched — gathering it with real
    indices would be out-of-bounds (JAX fills with NaN).
    """
    if isinstance(w, QuantizedArray):
        s = w.s if w.s.shape[axis] == 1 else jnp.take(w.s, idx, axis=axis)
        return QuantizedArray(jnp.take(w.q, idx, axis=axis), s, w.bits, w.groups, getattr(w, "scheme", "linear"))
    return jnp.take(w, idx, axis=axis)


_QUANT_MIN_SIZE = 1 << 16  # don't quantize small tensors (norms, biases, gates)


def quantize_tree(params, bits: int = 8, min_size: int = _QUANT_MIN_SIZE, model_shards: int = 1, scheme: str = "linear"):
    """Quantize every large >=2-D floating leaf of a param pytree.

    Router gates, norms and biases stay fp (routing numerics are fp32-sensitive,
    reference gate softmax :509-511).

    model_shards > 1 (int4 + mesh serving): pack expert `down_proj` tables
    SHARD-LOCALLY (groups=model_shards) so the model-axis shard of the packed
    rows each device receives is itself a valid packed table — the Pallas int4
    kernels then run under the manual-SPMD shard_map wrappers instead of
    degrading to masked-dense (VERDICT r2 #6). gate/up pack along the
    (unsharded) h contraction dim, so they stay single-group.
    """

    def visit(path, x):
        if not hasattr(x, "ndim") or x.ndim < 2:
            return x
        if not jnp.issubdtype(x.dtype, jnp.floating):
            return x
        if int(np.prod(x.shape)) < min_size:
            return x
        parts = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        pstr = ".".join(parts)
        # only true weight matrices: dict leaves named "w", or raw expert stacks.
        # Biases/norm scales must NOT be quantized — a depth-stacked bias would
        # get its scale reduced over the layer axis.
        is_weight = parts[-1] == "w" or parts[-1] in ("gate_proj", "up_proj", "down_proj")
        parent = parts[-2] if len(parts) >= 2 else ""
        is_norm = "norm" in parent or parent.endswith("ln") or parent.startswith("ln")
        if not is_weight or is_norm:
            return x
        if "gate.w" in pstr or "image_gate" in pstr or "audio_gate" in pstr:
            return x  # keep routers full precision
        if bits == 4 and "word_embeddings" in pstr:
            return quantize_array(x, 8)  # embedding rows are gathered pre-dequant
        if bits == 4 and x.shape[_scale_axes(x.ndim)] % 2:
            return quantize_array(x, 8)
        groups = 1
        if bits == 4 and model_shards > 1 and parts[-1] == "down_proj":
            n = x.shape[_scale_axes(x.ndim)]
            if n % (2 * model_shards) == 0:
                groups = model_shards
        return quantize_array(x, bits, groups=groups, scheme=scheme if bits == 4 else "linear")

    return jax.tree_util.tree_map_with_path(visit, params)


def quantize_tree_inplace(params: dict, bits: int = 8, min_size: int = _QUANT_MIN_SIZE, model_shards: int = 1, scheme: str = "linear"):
    """Destructive variant of `quantize_tree` for HBM-tight conversions: walks
    the nested-dict tree REPLACING each leaf as it goes, so the bf16 original
    of an already-quantized leaf is freed before the next leaf's quantize
    temps allocate (peak = tree + ONE leaf's fp32 temps instead of tree +
    full quantized copy). Same leaf policy as quantize_tree (the per-leaf
    visit is shared via a single-leaf tree_map_with_path on a keyed subtree).

    Mutates and returns `params` (dicts only — the param trees this library
    builds are nested dicts of arrays)."""

    _SLICE_BYTES = 256 * 1024 * 1024  # quantize >256 MB leaves per leading slice

    def one(k, v, parts):
        # single-leaf subtree keeps the full key path for the policy
        sub = {str(k): v}
        for i in range(len(parts) - 1, -1, -1):
            sub = {parts[i]: sub}
        out = quantize_tree(sub, bits=bits, min_size=min_size, model_shards=model_shards, scheme=scheme)
        for p in parts:
            out = out[p]
        return out[str(k)]

    def walk(d, parts):
        for k in list(d.keys()):
            v = d[k]
            if isinstance(v, dict):
                walk(v, parts + [str(k)])
                continue
            nbytes = getattr(v, "nbytes", 0) or 0
            if (
                nbytes > _SLICE_BYTES
                and getattr(v, "ndim", 0) >= 3
                and v.shape[0] > 1
            ):
                # quantize per leading (depth-stack) slice: the fp32 temps of
                # quantize_array are ~3x the leaf — whole-leaf conversion of a
                # GB-scale stacked expert table on top of a near-full HBM OOMs.
                # Scales reduce over contraction axes only, so slicing the
                # leading axis is numerically identical.
                pieces = [one(k, v[i : i + 1], parts) for i in range(v.shape[0])]
                if isinstance(pieces[0], QuantizedArray):
                    d[k] = QuantizedArray(
                        jnp.concatenate([p.q for p in pieces], axis=0),
                        jnp.concatenate([p.s for p in pieces], axis=0),
                        pieces[0].bits,
                        pieces[0].groups,
                        getattr(pieces[0], "scheme", "linear"),
                    )
                else:  # policy left it dense
                    d[k] = v
                del pieces, v
            else:
                d[k] = one(k, v, parts)
                del v

    walk(params, [])
    return params


@functools.partial(jax.jit, static_argnums=(1,))
def _gen_u8(key, shape):
    # jitted so the threefry u32 intermediates fuse into the store — the eager
    # path materializes ~4x the output (OOMs depth-stacked int8 tables)
    return jax.random.bits(key, shape, jnp.uint8)


def random_quantized_like(key, params, bits: int = 8, min_size: int = _QUANT_MIN_SIZE):
    """Create random QUANTIZED params with the same tree/shape structure as
    `params` directly on the default device — no full-precision intermediate and
    no host->device transfer of dequantized weights (init of a 16B model through
    a slow link would otherwise dominate; benchmarking aid)."""

    def visit(path, x):
        if not hasattr(x, "ndim"):
            return x
        parts = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        pstr = ".".join(parts)
        is_weight = parts[-1] == "w" or parts[-1] in ("gate_proj", "up_proj", "down_proj")
        parent = parts[-2] if len(parts) >= 2 else ""
        is_norm = "norm" in parent or parent.endswith("ln") or parent.startswith("ln")
        quantizable = (
            x.ndim >= 2
            and jnp.issubdtype(jnp.dtype(x.dtype), jnp.floating)
            and int(np.prod(x.shape)) >= min_size
            and is_weight
            and not is_norm
            and "gate.w" not in pstr
            and "image_gate" not in pstr
            and "audio_gate" not in pstr
        )
        k = jax.random.fold_in(key, hash(pstr) % (1 << 30))
        if not quantizable:
            return jax.random.normal(k, x.shape, jnp.float32).astype(x.dtype) * 0.02
        b = bits
        if b == 4 and ("word_embeddings" in pstr or x.shape[_scale_axes(x.ndim)] % 2):
            b = 8
        ax = _scale_axes(x.ndim)
        sshape = list(x.shape)
        sshape[ax] = 1
        s = jnp.full(sshape, 0.02 / (127.0 if b == 8 else 7.0), jnp.float32)
        if b == 4:
            qshape = list(x.shape)
            qshape[ax] //= 2
            q = _gen_u8(k, tuple(qshape))
        else:
            q = _gen_u8(k, tuple(x.shape)).astype(jnp.int8)
        return QuantizedArray(q, s, b)

    shapes = jax.eval_shape(lambda: params) if callable(params) else params
    return jax.tree_util.tree_map_with_path(visit, shapes)


def quantized_size_bytes(params) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        if hasattr(leaf, "size") and hasattr(leaf, "dtype"):
            total += leaf.size * leaf.dtype.itemsize
    return total
