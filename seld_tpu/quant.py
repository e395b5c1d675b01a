"""Post-training int8 quantization for serving (TPU addition).

The reference has no quantization story (it serves f32 torch modules
inside its evaluation loop, ref trainer.py:394-711). This module adds a
PTQ path aimed at the v5e MXU's int8 throughput (2x the bf16 peak):

  * weights: symmetric per-output-channel int8 (absmax/127), quantized
    once from a trained checkpoint;
  * activations: symmetric per-tensor int8 with scales calibrated by
    running representative audio through the model (absmax over the
    calibration set, collected with flax `sow` under an interceptor —
    no model rewrite);
  * compute: s8 x s8 -> s32 on the MXU
    (`preferred_element_type=int32`), dequantized as
    y = y_s32 * (s_x * s_w) + bias in f32, then cast back to the
    module's compute dtype.

Coverage: every `nn.Conv` with feature_group_count == 1 (the ResNet50 /
CSPDarkNet / CNN-encoder trunks — where the serving FLOPs are), every
`nn.Dense`, and the class-major `nn.DenseGeneral` grid head. Depthwise
convs (the conformer conv module), norms, attention score/value dots,
pooling, and the mel front-end stay in the original dtype: they are a
small FLOP share and the first/last-mile numerics matter most there.

Symmetric quantization keeps zero exact, so 'SAME' zero-padding and
zero-masked windows behave identically to the float path.

The swap is a pure flax method interceptor: the original modules,
parameters, and checkpoints are untouched, and the quantized forward
is an ordinary jittable function of (variables, quant_tree, input).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

QUANT_COLLECTION = "quant_stats"
_QMAX = 127.0


def _in_rnn_cell(mod) -> bool:
    parent = getattr(mod, "parent", None)
    while parent is not None:
        if isinstance(parent, nn.RNNCellBase):
            return True
        parent = getattr(parent, "parent", None)
    return False


def _eligible(mod) -> bool:
    # Recurrent-gate denses live under nn.scan: `sow` collections are
    # not threaded through the scan, and per-step gate quantization is
    # a known accuracy hazard — the GRU stays in the original dtype.
    if _in_rnn_cell(mod):
        return False
    if isinstance(mod, nn.Conv):
        # 2-D, ungrouped, undilated convs only (all trunk convs; the
        # depthwise conformer conv stays float).
        if mod.feature_group_count != 1:
            return False
        ksize = mod.kernel_size
        if isinstance(ksize, int) or len(ksize) != 2:
            return False

        def _dilated(d):
            if d is None or isinstance(d, int):
                return d not in (None, 1)
            return any(v != 1 for v in d)

        if _dilated(mod.kernel_dilation) or _dilated(mod.input_dilation):
            return False  # _int8_conv assumes dilation 1
        return True
    if isinstance(mod, nn.DenseGeneral):
        return mod.batch_dims == () and mod.axis == -1
    return isinstance(mod, nn.Dense)


def _path_str(mod) -> str:
    return "/".join(mod.path)


# -- calibration ------------------------------------------------------------


def _calib_interceptor(next_fun, args, kwargs, context):
    mod = context.module
    if context.method_name == "__call__" and _eligible(mod):
        mod.sow(
            QUANT_COLLECTION,
            "absmax_in",
            jnp.max(jnp.abs(args[0])).astype(jnp.float32),
            init_fn=lambda: jnp.zeros((), jnp.float32),
            reduce_fn=jnp.maximum,
        )
    return next_fun(*args, **kwargs)


def calibrate_activation_scales(model, variables, batches) -> dict:
    """Run `batches` (iterable of model inputs, e.g. (B, T, C, F) mel)
    through the model in eval mode and return {param-path: s_x} with
    s_x = absmax(input)/127 per quantizable layer."""

    @jax.jit
    def one(variables, batch):  # variables as an argument, NOT a closure:
        # closed-over f32 weights would inline into the HLO as constants
        # (remote compiles over the tunnel reject very large programs)
        with nn.intercept_methods(_calib_interceptor):
            _, stats = model.apply(
                variables, batch, train=False, mutable=[QUANT_COLLECTION]
            )
        return stats[QUANT_COLLECTION]

    absmax: dict = {}
    n = 0
    for batch in batches:
        stats = jax.device_get(one(variables, jnp.asarray(batch)))
        flat = jax.tree_util.tree_flatten_with_path(stats)[0]
        for key_path, value in flat:
            path = "/".join(
                str(getattr(k, "key", k)) for k in key_path
            ).replace("/absmax_in", "").rstrip("/")
            # sow stores a tuple; tree paths include the tuple index
            path = "/".join(p for p in path.split("/") if not p.isdigit())
            absmax[path] = max(absmax.get(path, 0.0), float(np.max(value)))
        n += 1
    if n == 0:
        raise ValueError("calibration requires at least one batch")
    return {
        p: (a / _QMAX if a > 0 else 1.0) for p, a in absmax.items()
    }


# -- weight quantization ----------------------------------------------------


def _n_out_dims(kernel) -> int:
    """Output-channel dims of an eligible layer's kernel: Conv
    (kh, kw, Cin, Cout) and Dense (in, out) -> 1; DenseGeneral
    (in, *features) -> len(features). Shared by PTQ and QAT so both
    quantize against identical per-channel scales."""
    if kernel.ndim in (2, 4):
        return 1
    return kernel.ndim - 1


def _quantize_weight(kernel, n_out_dims: int):
    """Symmetric per-output-channel int8. Output channels are the
    trailing `n_out_dims` dims of the kernel (flax convention: Conv
    (kh, kw, Cin, Cout) and Dense (in, out) -> 1; DenseGeneral
    (in, *features) -> len(features))."""
    k = np.asarray(jax.device_get(kernel), np.float32)
    reduce_axes = tuple(range(k.ndim - n_out_dims))
    absmax = np.max(np.abs(k), axis=reduce_axes)
    s_w = np.where(absmax > 0, absmax / _QMAX, 1.0).astype(np.float32)
    w_q = np.clip(np.round(k / s_w), -_QMAX, _QMAX).astype(np.int8)
    return w_q, s_w


def build_quant_tree(model, variables, act_scales: dict,
                     weight_only: bool = False) -> dict:
    """{path: {w_q, s_w, s_x, bias}} for every calibrated layer. The
    tree is a plain pytree of arrays — pass it through jit as an
    argument (weights as jit constants would bloat the HLO).

    `weight_only=True` omits s_x: the interceptor then dequantizes the
    int8 weights to the compute dtype and runs the original-precision
    op — no MXU int8 speedup, but exported artifacts carry int8 weights
    (~4x smaller) at near-float accuracy (per-channel weight
    quantization error only)."""
    params = variables["params"]
    out: dict = {}
    for path, s_x in act_scales.items():
        node = params
        for part in path.split("/"):
            node = node[part]
        kernel = node["kernel"]
        w_q, s_w = _quantize_weight(kernel, _n_out_dims(kernel))
        entry = {
            "w_q": jnp.asarray(w_q),
            "s_w": jnp.asarray(s_w),
        }
        if not weight_only:
            entry["s_x"] = jnp.asarray(np.float32(s_x))
        if "bias" in node:
            entry["bias"] = jnp.asarray(
                np.asarray(jax.device_get(node["bias"]), np.float32)
            )
        out[path] = entry
    return out


# -- quantized forward ------------------------------------------------------


def _canon_padding(padding, rank: int):
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return [(padding, padding)] * rank
    out = []
    for p in padding:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return out


def _canon_strides(strides, rank: int):
    if strides is None:
        return (1,) * rank
    if isinstance(strides, int):
        return (strides,) * rank
    return tuple(strides)


def _quant_act(x, s_x):
    return (
        jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -_QMAX, _QMAX)
        .astype(jnp.int8)
    )


def _result_dtype(mod, x):
    return mod.dtype if mod.dtype is not None else x.dtype


def _dequant_weight(q, dtype):
    """Weight-only mode: int8 kernel back to the compute dtype."""
    return (q["w_q"].astype(jnp.float32) * q["s_w"]).astype(dtype)


def _int8_conv(mod: nn.Conv, x, q):
    weight_only = "s_x" not in q
    dtype = _result_dtype(mod, x)
    if weight_only:
        lhs, rhs = x.astype(dtype), _dequant_weight(q, dtype)
        pref = None
    else:
        lhs, rhs = _quant_act(x, q["s_x"]), q["w_q"]
        pref = jnp.int32
    y = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=_canon_strides(mod.strides, 2),
        padding=_canon_padding(mod.padding, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pref,
    )
    if not weight_only:
        y = y.astype(jnp.float32) * (q["s_x"] * q["s_w"])
    if mod.use_bias:
        y = y.astype(jnp.float32) + q["bias"]
    return y.astype(dtype)


def _int8_dense(mod, x, q):
    weight_only = "s_x" not in q
    dtype = _result_dtype(mod, x)
    if weight_only:
        lhs = x.astype(dtype)
        w = _dequant_weight(q, dtype)
        pref = None
    else:
        lhs = _quant_act(x, q["s_x"])
        w = q["w_q"]
        pref = jnp.int32
    features = w.shape[1:]
    w2 = w.reshape(w.shape[0], -1)
    y = jax.lax.dot_general(
        lhs, w2, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=pref,
    )
    y = y.reshape(*x.shape[:-1], *features)
    if not weight_only:
        y = y.astype(jnp.float32) * (q["s_x"] * q["s_w"])
    if mod.use_bias:
        y = y.astype(jnp.float32) + q["bias"]
    return y.astype(dtype)


def make_quant_interceptor(quant_tree: dict):
    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name == "__call__" and _eligible(mod):
            q = quant_tree.get(_path_str(mod))
            if q is not None:
                x = args[0]
                if isinstance(mod, nn.Conv):
                    return _int8_conv(mod, x, q)
                return _int8_dense(mod, x, q)
        return next_fun(*args, **kwargs)

    return interceptor


def quantized_apply(model, variables, quant_tree, x, **kwargs):
    """Eval-mode forward with every calibrated layer running int8.
    Jit-friendly: jit over (variables, quant_tree, x)."""
    with nn.intercept_methods(make_quant_interceptor(quant_tree)):
        return model.apply(variables, x, train=False, **kwargs)


def apply_maybe_quantized(model, variables, quant_tree, x, **kwargs):
    """Eval-mode forward that is the float path when quant_tree is None
    and the int8 path otherwise — the shared dispatch for every int8
    serving/eval surface. The quant tree must ride as a jit ARGUMENT,
    never a closure: closed-over int8 weights inline into the HLO as
    constants (remote compiles over the tunnel reject very large
    programs) and a re-quantize would keep serving the stale tree
    through the old jit cache entry. Baked-in constants are only right
    for export_serving's standalone artifact."""
    if quant_tree is None:
        return model.apply(variables, x, train=False, **kwargs)
    return quantized_apply(model, variables, quant_tree, x, **kwargs)


def quantize_model(model, variables, calib_batches, weight_only=False):
    """One-call PTQ: calibrate activation scales on `calib_batches`
    (iterable of eval-mode inputs) and quantize the weights. Returns the
    quant tree for `quantized_apply`. `weight_only=True` quantizes only
    the weights (int8 storage, original-precision compute — ~4x smaller
    export artifacts at near-float accuracy); the calibration pass is
    still used to discover the eligible layers."""
    scales = calibrate_activation_scales(model, variables, calib_batches)
    return build_quant_tree(model, variables, scales, weight_only=weight_only)


# -- quantization-aware training (fake-quant with straight-through) ---------


def _fake_quant(x, s):
    """Symmetric int8 quantize-dequantize with a straight-through
    estimator: forward snaps to the grid, backward passes gradients
    through unchanged (scales are stop-gradiented)."""
    s = jax.lax.stop_gradient(s)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -_QMAX, _QMAX) * s
    return (x.astype(jnp.float32)
            + jax.lax.stop_gradient(q - x.astype(jnp.float32))).astype(x.dtype)


def _live_weight_scale(kernel, n_out_dims: int):
    reduce_axes = tuple(range(kernel.ndim - n_out_dims))
    absmax = jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=reduce_axes)
    return jnp.where(absmax > 0, absmax / _QMAX, 1.0)


def qat_interceptor(next_fun, args, kwargs, context):
    """Fake-quantize eligible layers during TRAINING: activations snap
    to a per-tensor int8 grid (scale = current-batch absmax/127) and
    weights to their per-output-channel grid, both with straight-through
    gradients — the network learns weights that survive int8 serving.
    Same eligibility as PTQ (trunk convs, denses, the grid head); the
    op itself runs in the original dtype, so QAT costs a few elementwise
    passes, not precision."""
    mod = context.module
    if context.method_name != "__call__" or not _eligible(mod):
        return next_fun(*args, **kwargs)
    x = args[0]
    s_x = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-8) / _QMAX
    xq = _fake_quant(x, s_x)
    params = dict(mod.variables["params"])
    kernel = params["kernel"]
    kq = _fake_quant(kernel, _live_weight_scale(kernel, _n_out_dims(kernel)))
    dtype = _result_dtype(mod, x)
    if isinstance(mod, nn.Conv):
        y = jax.lax.conv_general_dilated(
            xq.astype(dtype),
            kq.astype(dtype),
            window_strides=_canon_strides(mod.strides, 2),
            padding=_canon_padding(mod.padding, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    else:
        features = kq.shape[1:]
        y = jax.lax.dot_general(
            xq.astype(dtype), kq.reshape(kq.shape[0], -1).astype(dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
        )
        y = y.reshape(*x.shape[:-1], *features)
    if mod.use_bias:
        y = y.astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(dtype)


def qat_apply(model, variables, x, **kwargs):
    """Forward with fake-quantized eligible layers (testing/inspection
    helper; the train step applies the interceptor around its own
    model.apply)."""
    with nn.intercept_methods(qat_interceptor):
        return model.apply(variables, x, **kwargs)
