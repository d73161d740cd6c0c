"""Functional NN building blocks for the CLIP towers.

Pure-function layers over explicit param pytrees (no flax modules): this keeps
weight conversion, LoRA injection, pjit sharding annotations, and Pallas
kernel swap-in trivial. Transformer stacks are STACKED along a leading
layer axis and executed with ``lax.scan`` — one compiled block body instead of
12 unrolled copies (faster XLA compiles, natural ``jax.checkpoint`` boundary).

Numerics contract (for the ≥0.999 cosine parity bar vs the reference CLIP,
SURVEY §7 "hard parts"):
- LayerNorm eps 1e-5, computed in float32 regardless of compute dtype;
- quick-gelu ``x * sigmoid(1.702 x)`` (NOT tanh-gelu);
- attention scale ``head_dim ** -0.5`` applied to q;
- softmax in float32;
- matmuls honor ``compute_dtype`` with float32 accumulation
  (``preferred_element_type``).

LoRA: every linear accepts an optional ``{"a": (in, r), "b": (r, out)}``
adapter; forward adds ``scaling * (x @ a) @ b`` — the x@A@B convention of
PEFT (BASELINE.json north star). ``a``/``b`` here are already transposed to
the right-multiply layout (PEFT stores (r, in)/(out, r); the converter in
``lora/peft_io.py`` handles the transpose).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax

Params = dict[str, Any]

# Kernel-dispatch switches (module-level so jit closures pick them up at trace
# time). Enabled by ClipEncoder/config on TPU; tests flip them explicitly.
# flash_attention: False | True | "auto" — "auto" picks per sequence length
# from the measured v5e crossover table (docs/DESIGN.md §7.3): XLA's fused
# attention wins at CLIP's S=50/77; the Pallas flash kernel only reaches
# parity from S≈128 where the blocked online-softmax starts paying for its
# launch + layout overhead.
_KERNEL_FLAGS = {
    "fused_lora": False,
    "flash_attention": False,
    "small_attention": False,
    "fused_mlp": False,
    "fused_lora_dropout": False,
    "fast_ln": False,
    "interpret": False,
}

# r3 in-tower re-measurement (docs/DESIGN.md §7.3): the Pallas flash kernel
# LOSES to XLA's fused attention at EVERY supported CLIP geometry on v5e —
# S=197 (B/16, 2-3x), S=257 (L/14, 1.7x), S=577 (L/14-336, 1.3x) — and the
# r2 isolated table already showed a 1.45x loss at S=1024. "auto" therefore
# never dispatches flash on this hardware; the gate constant stays so future
# hardware/geometries can re-measure and lower it, and explicit
# flash_attention=True still forces the kernel.
FLASH_MIN_SEQ = 1 << 30

# The small-sequence kernel pads S up to a 64-row tile and keeps the whole
# sequence in VMEM; measured on v5e it wins ~20% in-tower at S=50 (one tile,
# image tower) but LOSES ~30% at S=77 (pads to 128 → 40% dead rows while
# XLA's fused attention runs the true 77): 16.9k → 11.4k txt/s at T=256.
# Dispatch it only where a single 64-row tile suffices.
SMALL_ATTN_MAX_SEQ = 64

# Structural (in-kernel causal+lengths mask) dispatch gate: the r3 S=77 loss
# was the streamed per-batch fp32 mask blocks, not the 77->80 row padding
# (attention_small pads to the 16-row sublane tile). With the mask computed
# in-kernel, S=77 measured on v5e r4 (ragged masks, same-process A/B):
# T=256 15.8k -> 18.1k txt/s (+15%), T=96 neutral (18.0 vs 18.1k). Gate 80.
SMALL_ATTN_CAUSAL_MAX_SEQ = 80


def set_kernel_flags(
    fused_lora: bool | None = None,
    flash_attention: bool | str | None = None,
    small_attention: bool | None = None,
    fused_mlp: bool | None = None,
    fused_lora_dropout: bool | None = None,
    fast_ln: bool | None = None,
    interpret: bool | None = None,
) -> dict:
    """Toggle Pallas kernel dispatch; returns the previous flags."""
    prev = dict(_KERNEL_FLAGS)
    if fused_lora is not None:
        _KERNEL_FLAGS["fused_lora"] = fused_lora
    if flash_attention is not None:
        _KERNEL_FLAGS["flash_attention"] = flash_attention
    if small_attention is not None:
        _KERNEL_FLAGS["small_attention"] = small_attention
    if fused_mlp is not None:
        _KERNEL_FLAGS["fused_mlp"] = fused_mlp
    if fused_lora_dropout is not None:
        _KERNEL_FLAGS["fused_lora_dropout"] = fused_lora_dropout
    if fast_ln is not None:
        _KERNEL_FLAGS["fast_ln"] = fast_ln
    if interpret is not None:
        _KERNEL_FLAGS["interpret"] = interpret
    return prev


def _use_flash(seq_len: int) -> bool:
    flag = _KERNEL_FLAGS["flash_attention"]
    if flag == "auto":
        return seq_len >= FLASH_MIN_SEQ
    return bool(flag)


def get_kernel_flags() -> tuple:
    """Hashable snapshot of the dispatch flags — include in jit cache keys so
    flag flips after a cache is populated retrace instead of being ignored."""
    return tuple(sorted(_KERNEL_FLAGS.items()))


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's activation: x * sigmoid(1.702 x) (HF CLIPConfig hidden_act)."""
    return x * jax.nn.sigmoid(1.702 * x)


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm in fp32 for stability, cast back to input dtype.

    With ``set_kernel_flags(fast_ln=True)`` (training fast path, r4) the
    same math runs under a custom_vjp whose only saved residual is the
    INPUT (bf16 in the production towers) — plain AD of the fp32-cast form
    saves fp32 intermediates ((B,S,D) per LN per layer) that the backward
    then re-reads. μ/σ/x̂ are recomputed in the bwd from x; since the fp32
    cast of a bf16 x is exact, the gradients are bit-identical to AD's on
    the bf16 production path (fp32 inputs differ from AD by ~1 ulp — the
    hand-derived dx associates reductions differently; grad-parity test in
    tests/test_kernel_integration.py)."""
    if _KERNEL_FLAGS["fast_ln"]:
        return _ln_fast(x, p["scale"], p["bias"], eps)
    return _ln_plain(x, p["scale"], p["bias"], eps)


def _ln_plain(x, scale, bias, eps):
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ln_fast(x, scale, bias, eps):
    return _ln_plain(x, scale, bias, eps)


def _ln_fast_fwd(x, scale, bias, eps):
    return _ln_plain(x, scale, bias, eps), (x, scale)


def _ln_fast_bwd(eps, res, dy):
    x, scale = res
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    rstd = lax.rsqrt(var + eps)
    xhat = (x32 - mu) * rstd
    dy32 = dy.astype(jnp.float32)
    g = dy32 * scale.astype(jnp.float32)
    dx = rstd * (
        g
        - jnp.mean(g, axis=-1, keepdims=True)
        - xhat * jnp.mean(g * xhat, axis=-1, keepdims=True)
    )
    red = tuple(range(x.ndim - 1))
    dscale = jnp.sum(dy32 * xhat, axis=red)
    dbias = jnp.sum(dy32, axis=red)
    return (
        dx.astype(x.dtype),
        dscale.astype(scale.dtype),
        dbias.astype(scale.dtype),
    )


_ln_fast.defvjp(_ln_fast_fwd, _ln_fast_bwd)


def linear(
    p: Params,
    x: jnp.ndarray,
    lora: Optional[Params] = None,
    lora_scaling: float = 1.0,
    compute_dtype: Optional[jnp.dtype] = None,
    lora_dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """y = x @ kernel + bias [+ lora_scaling * (drop(x) @ a) @ b].

    kernel layout is (in, out) — right-multiply, so the LoRA delta composes
    as pure matmuls on the MXU. fp32 accumulation via preferred_element_type.
    LoRA dropout (train-time only, rate from ref:config/lora_config.yaml)
    applies to the adapter branch input, PEFT convention.
    """
    out_dtype = x.dtype
    if "kernel_q" in p:
        # int8 serving path (quant/int8.py): dynamic per-token activation
        # quant + int8 MXU dot; LoRA delta stays float, added after dequant.
        from clip_lora_match_tpu.quant.int8 import int8_matmul

        y = int8_matmul(x, p["kernel_q"], p["w_scale"])
        if lora is not None:
            y = y + _lora_delta(x, lora, lora_scaling, lora_dropout, dropout_rng)
        if p.get("bias") is not None:
            y = y + p["bias"].astype(y.dtype)
        return y.astype(out_dtype)
    w = p["kernel"]
    # fp32 path (parity/CPU): fp32 accumulation AND fp32 elementwise tail.
    # bf16 path (TPU production): MXU still accumulates fp32 internally, but
    # the matmul OUTPUT is bf16 (preferred_element_type=compute_dtype) so the
    # (M, N) intermediates never hit HBM at fp32 width; bias/LoRA adds happen
    # in bf16. Halves activation bandwidth for a ~1-ulp bf16 rounding cost.
    acc_dtype = jnp.float32 if compute_dtype is None else compute_dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    # Fused Pallas path: base matmul + LoRA delta in one kernel, one pass
    # over x (inference path — no dropout).
    if (
        _KERNEL_FLAGS["fused_lora"]
        and lora is not None
        and (lora_dropout == 0.0 or dropout_rng is None)
    ):
        from clip_lora_match_tpu.ops.lora_matmul import lora_matmul

        shape = x.shape
        x2 = x.reshape(-1, shape[-1])
        y = lora_matmul(
            x2,
            w,
            lora["a"].astype(x.dtype),
            lora["b"].astype(x.dtype),
            scaling=float(lora_scaling),
            interpret=_KERNEL_FLAGS["interpret"],
        ).reshape(*shape[:-1], w.shape[-1])
        if "bias" in p and p["bias"] is not None:
            y = y + p["bias"].astype(y.dtype)
        return y.astype(out_dtype)
    y = jnp.dot(x, w, preferred_element_type=acc_dtype)
    if lora is not None:
        a = lora["a"].astype(x.dtype)
        b = lora["b"].astype(x.dtype)
        xl = x
        if lora_dropout > 0.0 and dropout_rng is not None:
            keep = jax.random.bernoulli(dropout_rng, 1.0 - lora_dropout, x.shape)
            xl = jnp.where(keep, x / (1.0 - lora_dropout), 0.0).astype(x.dtype)
        y = y + (
            lora_scaling
            * jnp.dot(
                jnp.dot(xl, a, preferred_element_type=jnp.float32).astype(x.dtype),
                b,
                preferred_element_type=jnp.float32,
            )
        ).astype(acc_dtype)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(acc_dtype)
    return y.astype(out_dtype)


def _lora_get(lora_block: Optional[Params], name: str) -> Optional[Params]:
    if lora_block is None:
        return None
    return lora_block.get(name)


def _lora_delta(x, lora, scaling, lora_dropout, dropout_rng):
    """scaling · (drop(x) @ a) @ b — the adapter branch of ``linear``."""
    a = lora["a"].astype(x.dtype)
    b = lora["b"].astype(x.dtype)
    xl = x
    if lora_dropout > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - lora_dropout, x.shape)
        xl = jnp.where(keep, x / (1.0 - lora_dropout), 0.0).astype(x.dtype)
    return scaling * jnp.dot(
        jnp.dot(xl, a, preferred_element_type=jnp.float32).astype(x.dtype),
        b,
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _qkv_lora_shared(x, a_cat, b_stk, rng, scaling, rate):
    """All three QKV LoRA deltas with ONE shared dropout mask.

    x (B,S,D); a_cat (D,3r) = concat(a_q,a_k,a_v); b_stk (3,r,D); returns
    (B,S,3,D) deltas. Training-throughput path (VERDICT r3 #1): the PEFT
    per-adapter independent masks cost 3 masked x copies saved for the
    backward (DESIGN §7.6: the LoRA wgrad surcharge is activation re-reads);
    one shared mask plus a mask-RECOMPUTING custom_vjp saves none of them —
    the bwd regenerates the mask from the rng (hardware RNG) and re-reads
    only the original x. Statistical change: masks are correlated across
    q/k/v within a layer (same marginal dropout per adapter); opt-in via
    set_kernel_flags(fused_lora_dropout=True) / TrainingConfig.
    """
    out, _ = _qkv_lora_shared_fwd(x, a_cat, b_stk, rng, scaling, rate)
    return out


def _qkv_masked(x, rng, rate):
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def _qkv_lora_shared_fwd(x, a_cat, b_stk, rng, scaling, rate):
    B, S, D = x.shape
    r = b_stk.shape[1]
    xl = _qkv_masked(x, rng, rate) if rate > 0.0 else x
    d = jnp.dot(xl, a_cat, preferred_element_type=jnp.float32).astype(x.dtype)
    d = d.reshape(B, S, 3, r)
    out = scaling * jnp.einsum(
        "bstr,trd->bstd", d, b_stk, preferred_element_type=jnp.float32
    )
    return out.astype(x.dtype), (x, a_cat, b_stk, rng)


def _qkv_lora_shared_bwd(scaling, rate, res, g):
    x, a_cat, b_stk, rng = res
    B, S, D = x.shape
    r = b_stk.shape[1]
    g = g.astype(x.dtype)
    xl = _qkv_masked(x, rng, rate) if rate > 0.0 else x
    d = jnp.dot(xl, a_cat, preferred_element_type=jnp.float32).astype(x.dtype)
    d = d.reshape(B, S, 3, r)
    db = scaling * jnp.einsum(
        "bstr,bstd->trd", d, g, preferred_element_type=jnp.float32
    )
    gd = scaling * jnp.einsum(
        "bstd,trd->bstr", g, b_stk, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    da = jnp.einsum(
        "bsd,bsk->dk", xl, gd.reshape(B, S, 3 * r),
        preferred_element_type=jnp.float32,
    )
    dxl = jnp.dot(
        gd.reshape(B, S, 3 * r), a_cat.T, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    if rate > 0.0:
        keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
        dx = jnp.where(keep, dxl / (1.0 - rate), 0.0).astype(x.dtype)
    else:
        dx = dxl
    return (
        dx,
        da.astype(a_cat.dtype),
        db.astype(b_stk.dtype),
        None,
    )


_qkv_lora_shared.defvjp(_qkv_lora_shared_fwd, _qkv_lora_shared_bwd)


def attention(
    p: Params,
    x: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    lora: Optional[Params] = None,
    lora_scaling: float = 1.0,
    compute_dtype: Optional[jnp.dtype] = None,
    lora_dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    core_attn_fn=None,
    causal: bool = False,
    key_lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Multi-head self-attention with optional additive mask.

    ``causal``/``key_lengths``: STRUCTURAL description of ``mask`` (causal +
    contiguous-prefix key validity). When provided AND the small-attention
    kernel dispatches, the penalty is rebuilt in-kernel from iota instead of
    streaming the (B, 1, S, S) fp32 mask (ops/attention_small.py r4). The
    additive ``mask`` stays authoritative for every other path.

    p: {q_proj, k_proj, v_proj, out_proj} each {kernel (D,D), bias (D,)}.
    mask: additive bias broadcastable to (B, 1, S, S) (0 or large-negative).

    ``core_attn_fn``: alternate score→softmax→value core with signature
    ``(qh, kh, vh, mask) -> (B, S, H, hd)`` replacing the kernel dispatch
    below — the injection point for sequence parallelism
    (parallel/sp.py's ring attention), which owns the mask's column
    semantics. Projections stay per-token and untouched.

    TPU notes: the three input projections run as ONE fused (D, 3D) matmul
    (concat at trace time — XLA hoists the concat out of the hot loop), and
    the head split uses einsum contractions directly on the (B, S, H, hd)
    layout so no explicit transpose copies are materialized. LoRA deltas stay
    per-projection (PEFT semantics: independent dropout masks per adapter).
    """
    B, S, D = x.shape
    H = num_heads
    hd = D // H
    kw = dict(lora_scaling=lora_scaling, compute_dtype=compute_dtype,
              lora_dropout=lora_dropout)

    def rng_for(i):
        if dropout_rng is None or lora_dropout <= 0.0:
            return None
        return jax.random.fold_in(dropout_rng, i)

    quantized = "kernel_q" in p["q_proj"]
    use_fused_pallas = (
        _KERNEL_FLAGS["fused_lora"] and lora is not None and not quantized
    )
    if use_fused_pallas:
        # per-projection path so the fused base+LoRA Pallas kernel dispatches
        q = linear(p["q_proj"], x, _lora_get(lora, "q_proj"), dropout_rng=rng_for(0), **kw)
        k = linear(p["k_proj"], x, _lora_get(lora, "k_proj"), dropout_rng=rng_for(1), **kw)
        v = linear(p["v_proj"], x, _lora_get(lora, "v_proj"), dropout_rng=rng_for(2), **kw)
    else:
        xc = x if compute_dtype is None else x.astype(compute_dtype)
        if quantized:
            # int8 fused QKV: one per-token activation quant feeds all three
            # int8 dots (kernels and per-out-channel scales concatenated at
            # trace time, hoisted by XLA like the float path's concat)
            from clip_lora_match_tpu.quant.int8 import int8_matmul

            wq = jnp.concatenate(
                [p[n]["kernel_q"] for n in ("q_proj", "k_proj", "v_proj")],
                axis=1,
            )
            ws = jnp.concatenate(
                [p[n]["w_scale"] for n in ("q_proj", "k_proj", "v_proj")]
            )
            qkv = int8_matmul(xc, wq, ws)
        else:
            acc_dtype = jnp.float32 if compute_dtype is None else compute_dtype
            w_qkv = jnp.concatenate(
                [p["q_proj"]["kernel"], p["k_proj"]["kernel"], p["v_proj"]["kernel"]],
                axis=1,
            )
            if compute_dtype is not None:
                w_qkv = w_qkv.astype(compute_dtype)
            qkv = jnp.dot(xc, w_qkv, preferred_element_type=acc_dtype)
        # biases are optional per projection (same contract as linear())
        biases = [p[n].get("bias") for n in ("q_proj", "k_proj", "v_proj")]
        if any(b is not None for b in biases):
            parts = [
                b if b is not None else jnp.zeros((D,), jnp.float32)
                for b in biases
            ]
            qkv = qkv + jnp.concatenate(parts).astype(qkv.dtype)
        lq, lk, lv = (
            _lora_get(lora, n) for n in ("q_proj", "k_proj", "v_proj")
        )
        use_shared = (
            _KERNEL_FLAGS["fused_lora_dropout"]
            and lora_dropout > 0.0
            and dropout_rng is not None
            and lq is not None and lk is not None and lv is not None
            and lq["a"].shape == lk["a"].shape == lv["a"].shape
        )
        if use_shared:
            a_cat = jnp.concatenate(
                [lq["a"], lk["a"], lv["a"]], axis=1
            ).astype(xc.dtype)
            b_stk = jnp.stack([lq["b"], lk["b"], lv["b"]]).astype(xc.dtype)
            deltas = _qkv_lora_shared(
                xc, a_cat, b_stk, jax.random.fold_in(dropout_rng, 0),
                float(lora_scaling), float(lora_dropout),
            )
            qkv = qkv + deltas.reshape(B, S, 3 * D).astype(qkv.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if not use_shared:
            for name, idx, t in (("q_proj", 0, "q"), ("k_proj", 1, "k"), ("v_proj", 2, "v")):
                lp = _lora_get(lora, name)
                if lp is not None:
                    delta = _lora_delta(
                        xc, lp, lora_scaling, lora_dropout, rng_for(idx)
                    ).astype(qkv.dtype)
                    if t == "q":
                        q = q + delta
                    elif t == "k":
                        k = k + delta
                    else:
                        v = v + delta
        q = q.astype(x.dtype)
        k = k.astype(x.dtype)
        v = v.astype(x.dtype)

    qh = q.reshape(B, S, H, hd)
    kh = k.reshape(B, S, H, hd)
    vh = v.reshape(B, S, H, hd)

    if core_attn_fn is not None:
        out = core_attn_fn(qh, kh, vh, mask)
    elif _KERNEL_FLAGS["small_attention"] and (
        S <= SMALL_ATTN_MAX_SEQ
        or (causal and S <= SMALL_ATTN_CAUSAL_MAX_SEQ)
    ):
        # NOTE: the small-attention kernel's max-free softmax assumes row
        # logits < 80 (exact softmax within that range; ≥80 logits clip
        # equal → uniform instead of near-one-hot attention). CLIP towers'
        # logits are empirically O(10); interpret/test mode asserts the
        # bound (ops/attention_small.py). Callers with exotic weights
        # should disable via set_kernel_flags(small_attention=False).
        from clip_lora_match_tpu.ops.attention_small import attention_small

        if causal:
            # structural mode: mask rebuilt in-kernel (zero mask bandwidth)
            out = attention_small(
                qh, kh, vh, scale=hd ** -0.5, causal=True,
                lengths=key_lengths, interpret=_KERNEL_FLAGS["interpret"],
            )
        else:
            out = attention_small(
                qh, kh, vh, mask=mask, scale=hd ** -0.5,
                interpret=_KERNEL_FLAGS["interpret"],
            )
    elif _use_flash(S):
        from clip_lora_match_tpu.ops.flash_attention import flash_attention

        out = flash_attention(
            qh.transpose(0, 2, 1, 3), kh.transpose(0, 2, 1, 3),
            vh.transpose(0, 2, 1, 3), mask=mask, scale=hd ** -0.5,
            interpret=_KERNEL_FLAGS["interpret"],
        ).transpose(0, 2, 1, 3)
    else:
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", qh * (hd ** -0.5), kh,
            preferred_element_type=jnp.float32,
        )
        if mask is not None:
            scores = scores + mask.astype(scores.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, vh, preferred_element_type=x.dtype
        )
    out = out.astype(x.dtype).reshape(B, S, D)
    return linear(
        p["out_proj"], out, _lora_get(lora, "out_proj"), dropout_rng=rng_for(3), **kw
    )


def mlp(
    p: Params,
    x: jnp.ndarray,
    lora: Optional[Params] = None,
    lora_scaling: float = 1.0,
    compute_dtype: Optional[jnp.dtype] = None,
    lora_dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    kw = dict(lora_scaling=lora_scaling, compute_dtype=compute_dtype,
              lora_dropout=lora_dropout)

    # Fused Pallas path: fc1 → quick-gelu → fc2 in one kernel, the (M, 4d)
    # hidden never leaving VMEM (docs/DESIGN.md §7.8). Only when neither MLP
    # matrix carries a LoRA adapter (the reference recipe adapts attention
    # projections only, ref:config/lora_config.yaml) and the weights are
    # plain (not int8-quantized). Differentiable via custom_vjp.
    if (
        _KERNEL_FLAGS["fused_mlp"]
        and _lora_get(lora, "fc1") is None
        and _lora_get(lora, "fc2") is None
        and "kernel" in p["fc1"]
        and "kernel" in p["fc2"]
        # the kernel signature requires biases (CLIP MLPs always have them;
        # bias-free callers keep the XLA path, where bias is optional)
        and p["fc1"].get("bias") is not None
        and p["fc2"].get("bias") is not None
    ):
        from clip_lora_match_tpu.ops.mlp_fused import mlp_fused

        shape = x.shape
        xc = x if compute_dtype is None else x.astype(compute_dtype)
        w1, b1 = p["fc1"]["kernel"], p["fc1"]["bias"]
        w2, b2 = p["fc2"]["kernel"], p["fc2"]["bias"]
        if compute_dtype is not None:
            w1, w2 = w1.astype(compute_dtype), w2.astype(compute_dtype)
        y = mlp_fused(
            xc.reshape(-1, shape[-1]),
            w1,
            b1,
            w2,
            b2,
            interpret=_KERNEL_FLAGS["interpret"],
        )
        return y.reshape(*shape[:-1], w2.shape[-1]).astype(x.dtype)

    def rng_for(i):
        if dropout_rng is None or lora_dropout <= 0.0:
            return None
        return jax.random.fold_in(dropout_rng, i)

    h = quick_gelu(
        linear(p["fc1"], x, _lora_get(lora, "fc1"), dropout_rng=rng_for(4), **kw)
    )
    return linear(p["fc2"], h, _lora_get(lora, "fc2"), dropout_rng=rng_for(5), **kw)


def transformer_block(
    p: Params,
    x: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    lora: Optional[Params] = None,
    lora_scaling: float = 1.0,
    eps: float = 1e-5,
    compute_dtype: Optional[jnp.dtype] = None,
    lora_dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    core_attn_fn=None,
    causal: bool = False,
    key_lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Pre-LN residual block (CLIP layout: LN → attn → +res; LN → MLP → +res)."""
    x = x + attention(
        p["attn"],
        layer_norm(p["ln_1"], x, eps),
        num_heads,
        mask=mask,
        lora=_lora_get(lora, "attn"),
        lora_scaling=lora_scaling,
        compute_dtype=compute_dtype,
        lora_dropout=lora_dropout,
        dropout_rng=dropout_rng,
        core_attn_fn=core_attn_fn,
        causal=causal,
        key_lengths=key_lengths,
    )
    x = x + mlp(
        p["mlp"],
        layer_norm(p["ln_2"], x, eps),
        lora=_lora_get(lora, "mlp"),
        lora_scaling=lora_scaling,
        compute_dtype=compute_dtype,
        lora_dropout=lora_dropout,
        dropout_rng=dropout_rng,
    )
    return x


def transformer(
    blocks: Params,
    x: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    lora_blocks: Optional[Params] = None,
    lora_scaling: float = 1.0,
    eps: float = 1e-5,
    compute_dtype: Optional[jnp.dtype] = None,
    remat: bool | str = False,
    lora_dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    unroll: int | bool = 1,
    core_attn_fn=None,
    causal: bool = False,
    key_lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Run a stacked transformer (leading layer axis on every leaf) via scan.

    ``lora_blocks`` mirrors ``blocks``' structure with the same leading layer
    axis, or is None. When ``dropout_rng`` is given with ``lora_dropout>0``
    (training), per-layer keys are derived and scanned alongside the params.

    ``remat``: False = save everything (fastest, most memory); True = full
    per-block rematerialization; "dots" = selective checkpointing that saves
    matmul outputs and recomputes only the cheap elementwise ops (the sweet
    spot at large batch: ~full-save speed at a fraction of the memory).
    """

    def body(carry, layer_params):
        blk, lora_blk, rng = layer_params
        out = transformer_block(
            blk,
            carry,
            num_heads,
            mask=mask,
            lora=lora_blk,
            lora_scaling=lora_scaling,
            eps=eps,
            compute_dtype=compute_dtype,
            lora_dropout=lora_dropout,
            dropout_rng=rng,
            core_attn_fn=core_attn_fn,
            causal=causal,
            key_lengths=key_lengths,
        )
        return out, None

    if remat == "dots":
        body = jax.checkpoint(
            body, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        )
    elif remat:
        body = jax.checkpoint(body)

    num_layers = jax.tree_util.tree_leaves(blocks)[0].shape[0]
    use_dropout = dropout_rng is not None and lora_dropout > 0.0
    if use_dropout:
        layer_rngs = jax.random.split(dropout_rng, num_layers)
    if lora_blocks is None:
        x, _ = lax.scan(
            lambda c, blk: body(c, (blk, None, None)), x, blocks, unroll=unroll
        )
    elif use_dropout:
        x, _ = lax.scan(
            lambda c, xs: body(c, xs), x, (blocks, lora_blocks, layer_rngs),
            unroll=unroll,
        )
    else:
        x, _ = lax.scan(
            lambda c, xs: body(c, (*xs, None)), x, (blocks, lora_blocks),
            unroll=unroll,
        )
    return x


def stack_blocks(block_list: list[Params]) -> Params:
    """Stack a list of per-layer param trees into one tree with a leading
    layer axis on every leaf (scan layout)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *block_list)


def unstack_blocks(blocks: Params) -> list[Params]:
    """Inverse of stack_blocks."""
    n = jax.tree_util.tree_leaves(blocks)[0].shape[0]
    return [jax.tree_util.tree_map(lambda x: x[i], blocks) for i in range(n)]
