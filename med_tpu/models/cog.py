"""COG — Chain-of-Gesture vision-language frame model (the flagship).

Reference ``MED/modeling/models_COG.py``. Per trial (B=1, T frames):

1. *Chain-of-thought cross-attention* (``MyTransformer``/``TransformerCOT``):
   project visual features (T, F) and the frozen 15x512 gesture-prompt table
   to d_model; for every frame, the 15 text tokens cross-attend a
   zero-padded window of the last len_q=30 visual frames (2 encoder layers,
   8 heads, d_q=8), then one single-head attention over the text tokens.
   Output: (T, 15*d_model).
   The reference materializes all T windows in a Python loop
   (models_COG.py:147-176); here the K/V projections are applied to the
   full sequence once and the banded sliding-window attention op does the
   rest (:mod:`med_tpu.ops.attention`) — no (T, 30, d) tensor exists.
2. *Slow path*: channel-dropout TCN stage (11 layers) + num_R refinement
   stages (10 layers, fed features not logits) + an FPN over the 4 feature
   maps (linear-interp upsample-add) -> 4 logit tracks.
3. *Fast path*: 16x average-pooled features through its own TCN stage +
   num_R refinements (fed softmaxed logits) -> 1 + num_R logit tracks at
   T/16 resolution.

Returns ``(out_list, f_list)`` of multi-resolution logits/features, consumed
by the fused CE + truncated-MSE smoothing loss (modeling_utils.py:1501-1521).

Reference quirks reproduced deliberately:
- ``MultiHeadAttention_COG.fc`` is defined but never applied
  (models_COG.py:46: ``output = context``) — so head outputs are concatenated
  raw and added to the residual (requires n_heads*d_q == d_model);
- its closing LayerNorm is created per-forward => unlearned (models_COG.py:47),
  while ``EncoderLayer_COG.norm1/norm3`` and ``Encoder_COG.norm`` are module
  attributes => learned;
- the refinement stages have ``hier=True`` with kernel_size=1 => their
  AvgPool is a no-op and every slow track stays at full resolution;
- the FPN applies the same lateral conv (latlayer1) to all levels
  (models_COG.py:217-219).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import attend, layer_norm, sliding_window_attention_packed
from ..ops.interpolate import interp1d_linear
from .layers import (
    Conv1d,
    ResidualStack,
    torch_default_kernel,
)
from .prompts import EMBED_DIM, GESTURES, load_prompt_embeddings
from .transsvnet import PoswiseFFN


class _PackedProj(nn.Module):
    """Bias-free QKV projection emitting the sliding-window attention
    kernel's PACKED layout directly: (N, d) — or (d, N) when
    ``transposed`` — -> (H, dk, N). The big token axis stays on lanes, so
    no minor-dim-8 tensors (which XLA lane-pads 16x physically) ever hit
    HBM.

    The kernel param is the plain (d_in, H*dk) matrix of an
    ``nn.Dense(use_bias=False)`` — same path ("<name>/kernel"), shape and
    init, so reference-checkpoint importers and existing checkpoints are
    unaffected; only the einsum's output layout differs (XLA folds it into
    the matmul instead of emitting a separate transpose)."""

    d_q: int
    n_heads: int
    transposed: bool = False   # input is feature-major (d, N)

    @nn.compact
    def __call__(self, x):
        d_in = x.shape[0] if self.transposed else x.shape[-1]
        kernel = self.param(
            "kernel", torch_default_kernel,
            (d_in, self.d_q * self.n_heads),
        )
        hk = kernel.reshape(d_in, self.n_heads, self.d_q)
        if self.transposed:
            return jnp.einsum("dn,dhk->hkn", x, hk)
        return jnp.einsum("nd,dhk->hkn", x, hk)


def _ln0(x, eps: float = 1e-5):
    """Affine-free layer norm over axis 0 (the feature axis of the d-major
    encoder layout) — same math as ops.attention.layer_norm on the moved
    axis.

    The encoder keeps every intermediate strictly 2D (d, N=T*M): a 3D
    (d, T, M) layout puts M=15 on lanes, which XLA pads to 128 — every
    materialization then costs an 8.5x-amplified relayout copy (~0.4 ms/step
    measured round 3)."""
    mean = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=0, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class _LayerNormD(nn.Module):
    """Learned LayerNorm applied over AXIS 0 of a (d, ...) feature-major
    tensor. Param names/shapes ("scale", "bias", (d,)) match nn.LayerNorm,
    so checkpoints and the torch importers see the usual layout."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        shape = (self.features,) + (1,) * (x.ndim - 1)
        return _ln0(x) * scale.reshape(shape) + bias.reshape(shape)


class _FFNT(nn.Module):
    """PoswiseFFN applied in the feature-major layout: same param tree as
    :class:`med_tpu.models.transsvnet.PoswiseFFN` (children Dense_0 /
    Dense_1 with (d_in, d_out) kernels), but the matmuls run transposed so
    no (N, d) relayout of the big token axis is needed. x is strictly 2D
    (d, N): any 3D (d, T, M) intermediate would put M=15 on lanes (XLA
    pads to 128 — an 8.5x physical blow-up with relayout copies on every
    materialization, ~0.3 ms/step measured round 3)."""

    d_model: int
    d_ff: int

    @nn.compact
    def __call__(self, x):
        from .transsvnet import _Kernel

        w1 = _Kernel(self.d_ff, name="Dense_0")(self.d_model)
        w2 = _Kernel(self.d_model, name="Dense_1")(self.d_ff)
        y = jnp.einsum("df,dn->fn", w1, x)
        y = nn.relu(y)
        y = jnp.einsum("fd,fn->dn", w2, y)
        return _ln0(y + x)


class COGAttention(nn.Module):
    """MultiHeadAttention_COG: QKV projections (no bias), concat heads
    *without* output projection, residual + unlearned LN."""

    d_model: int
    d_q: int
    n_heads: int

    @nn.compact
    def __call__(self, q_in, k_in, v_in):
        B = q_in.shape[0]

        def proj(x, name):
            y = nn.Dense(
                self.d_q * self.n_heads, use_bias=False,
                kernel_init=torch_default_kernel, name=name,
            )(x)
            return y.reshape(B, -1, self.n_heads, self.d_q).transpose(0, 2, 1, 3)

        ctx = attend(proj(q_in, "W_Q"), proj(k_in, "W_K"), proj(v_in, "W_V"))
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, -1, self.n_heads * self.d_q)
        return layer_norm(ctx + q_in)


class _COGAttentionD(nn.Module):
    """COGAttention (single-head, no output projection, residual +
    unlearned LN — models_COG.py:14-47) in the feature-major layout, with
    the frame-invariant K/V (the prompt tokens) projected ONCE.

    Same param tree as :class:`COGAttention` (children W_Q/W_K/W_V Dense
    kernels), so checkpoints/importers are unaffected."""

    d_model: int

    @nn.compact
    def __call__(self, text, text0):
        """text (d, N) feature-major queries (N = T*M); text0 (M, d) shared
        K/V rows -> (d, N). Strictly 2D — see :class:`_FFNT`."""
        from .transsvnet import _Kernel

        d = self.d_model
        wq = _Kernel(d, name="W_Q")(d)
        wk = _Kernel(d, name="W_K")(d)
        wv = _Kernel(d, name="W_V")(d)
        qp = jnp.einsum("dn,de->en", text, wq)
        k0 = text0 @ wk                               # (M, d)
        v0 = text0 @ wv
        scores = jnp.einsum("en,je->jn", qp, k0) / math.sqrt(d)
        attn = jax.nn.softmax(scores, axis=0)
        ctx = jnp.einsum("jn,je->en", attn, v0)
        return _ln0(ctx + text)


class COGEncoderLayer(nn.Module):
    """EncoderLayer_COG: learned pre-norms around the fused local attention.

    ``__call__`` takes per-frame text queries plus the *full* visual sequence
    and runs the banded sliding-window attention (K/V projections commute
    with windowing, so this is exactly the reference computation).
    """

    d_model: int
    d_ff: int
    d_q: int
    n_heads: int
    window: int
    use_pallas: bool = True

    m_tokens: int = 15

    @nn.compact
    def __call__(self, text, visual_seq, train: bool = False):
        """text (d_model, N) FEATURE-MAJOR with N = T*M, visual_seq
        (T + window - 1, d_model) with explicit left-pad rows ->
        (d_model, N).

        The caller prepends ``window - 1`` pad rows: the reference layer-norms
        the *windowed* visual tensor, so the zero-pad slots of early windows
        carry the learned LN bias β (not zeros) into the K/V projections.
        Passing a pre-padded sequence whose pad rows are norm(0)=β and
        shifting the query alignment reproduces that exactly.

        The whole encoder stack stays feature-major AND strictly 2D (d on
        sublanes, the big T*M token axis on lanes): the packed projection
        consumes (d, N) directly and the kernel's (H, dv, N) context merges
        back to (H*dv, N) = (d_model, N) with a FREE leading-dim reshape.
        3D (d, T, M) intermediates would put M=15 on lanes (XLA lane-pads to
        128) — their materialization/relayout copies were ~0.3 ms of the
        round-3 step profile.
        """
        M = self.m_tokens
        q_in = _LayerNormD(self.d_model, name="norm1")(text)

        q = _PackedProj(self.d_q, self.n_heads, transposed=True,
                        name="W_Q")(q_in)
        k = _PackedProj(self.d_q, self.n_heads, name="W_K")(visual_seq)
        v = _PackedProj(self.d_q, self.n_heads, name="W_V")(visual_seq)

        T = visual_seq.shape[0] - (self.window - 1)
        pad = self.window - 1
        # Dummy queries for the pad positions (lane left-pad of the packed
        # token axis); their outputs are discarded.
        q = jnp.pad(q, ((0, 0), (0, 0), (pad * M, 0)))
        # Fused Pallas fwd + merged Pallas bwd (custom VJP); see
        # ops/attention.py and CLAUDE.md round-2 perf notes.
        ctx = sliding_window_attention_packed(
            q, k, v, self.window, M, self.use_pallas)[:, :, pad * M:]
        # (H, dv, N) -> (H*dv, N): leading-dim merge, no data movement
        ctx = ctx.reshape(self.n_heads * self.d_q, T * M)
        out = _ln0(ctx + q_in)  # unlearned LN inside COG attention

        out = _LayerNormD(self.d_model, name="norm3")(out)
        return _FFNT(self.d_model, self.d_ff, name="ffn")(out)


class ChainOfGestureTransformer(nn.Module):
    """MyTransformer + TransformerCOT: the chain-of-thought block."""

    f_dim: int          # visual feature width (2048 multimodal: video_dims+26 etc.)
    gest_dim: int       # prompt embedding width (512)
    d_model: int
    d_q: int
    len_q: int
    n_heads: int = 8
    n_layers: int = 2
    use_pallas: bool = True

    @nn.compact
    def __call__(self, gest_embed, long_feature, train: bool = False):
        """gest_embed (M, gest_dim), long_feature (T, f_dim) -> (T, M*d_model)."""
        visual = nn.Dense(self.d_model, use_bias=False,
                          kernel_init=torch_default_kernel, name="linear1")(long_feature)
        text0 = nn.Dense(self.d_model, use_bias=False,
                         kernel_init=torch_default_kernel, name="linear2")(gest_embed)
        T = visual.shape[0]
        M = text0.shape[0]

        # Encoder_COG.norm (learned) is applied to the zero-padded windows in
        # the reference, so pad rows become norm(0) = β; prepend them here.
        visual = jnp.pad(visual, ((self.len_q - 1, 0), (0, 0)))
        visual = nn.LayerNorm(name="enc_norm")(visual)
        # feature-major STRICTLY 2D (d, T*M) through the whole encoder stack
        # (see COGEncoderLayer): one transpose at the very end instead of
        # relayout copies around every layer. Token n = t*M + m, so the
        # initial per-frame text queries tile the (d, M) prompt columns T
        # times along lanes.
        text = jnp.tile(text0.T, (1, T))
        for i in range(self.n_layers):
            text = COGEncoderLayer(
                self.d_model, self.f_dim, self.d_q, self.n_heads,
                self.len_q, self.use_pallas, name=f"layer{i}", m_tokens=M,
            )(text, visual, train)

        # final single-head attention over the M original text tokens
        # (COGAttention semantics: no output projection, residual +
        # unlearned LN; the K/V are the SAME text0 rows for every frame, so
        # they project once — (M, d) — instead of per frame)
        out = _COGAttentionD(self.d_model, name="atten")(text, text0)
        # (d, N) -> (T, M*d): element (t, m*d+e) = out[e, t*M+m]. Expressed
        # as ONE 2D transpose + free row-major reshape — the equivalent
        # reshape(d,T,M).transpose(1,2,0) chain materialized 3D (d,T,M)
        # intermediates whose M=15 lane padding cost ~75 us/step of relayout
        # copies in the device profile (fwd + its VJP mirror).
        return out.T.reshape(T, M * self.d_model)


class COGStage(nn.Module):
    """SingleStageModel1_COG: optional 1x1 input conv, optional channel
    dropout, dilated residual stack, 1x1 class conv. Returns (features,
    logits).

    Setup-style (attribute names keep the historical param paths
    conv_in/stack/conv_out) so the merged slow path can drive the pieces
    individually: ``pre`` (conv_in + channel dropout), the stack's stacked
    weights/dropout mask, and ``post`` (class conv)."""

    num_layers: int
    f_maps: int
    out_classes: int
    causal: bool = True
    channel_dropout: bool = False
    use_input_conv: bool = True
    dtype: object = None
    fused: object = "auto"   # fused Pallas stack: "auto" (TPU) | True | False

    def setup(self):
        if self.use_input_conv:
            self.conv_in = Conv1d(self.f_maps, 1, dtype=self.dtype)
        self.stack = ResidualStack(
            self.num_layers, self.f_maps, causal=self.causal,
            dtype=self.dtype, fused=self.fused,
        )
        self.conv_out = Conv1d(self.out_classes, 1, dtype=self.dtype)

    def pre(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        out = self.conv_in(x) if self.use_input_conv else x
        if self.channel_dropout and train:
            # torch Dropout2d on (B, C, T, 1): zeroes whole channels
            # (drawn directly — nn.Dropout can't be created in a
            # non-compact method)
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 0.5,
                (out.shape[0], 1, out.shape[2]))
            out = out * keep.astype(out.dtype) * 2.0
        return out

    def stack_weights(self):
        return self.stack.weights()

    def stack_dropout_mask(self, B: int, T: int):
        return self.stack.dropout_mask(B, T)

    def post(self, out):
        logits = self.conv_out(out)
        # fp32 logits for losses / softmax refinement
        return out, logits.astype(jnp.float32)

    def __call__(self, x, train: bool = False):
        out = self.stack(self.pre(x, train), train)
        return self.post(out)


class COG(nn.Module):
    """Configuration variants (reference models_COG.py:262-480):

    - default: 15 gesture prompts via the chain-of-thought block;
    - ``use_all_gestures=False``: the 8 dataset-observed gestures only;
    - ``use_skill_prompt=True``: a 45-row table of skill-conditioned prompts
      ("A self-reported {skill}-skilled surgeon is {gesture} …", 3 skills x
      15 gestures, models_COG.py:416-424);
    - ``srm=True``: a second chain ("skill-reasoning module") over 15 skill
      statements, concatenated with the gesture chain before the TCN paths
      (models_COG.py:489-492).
    """

    num_layers_basic: int = 11
    num_layers_r: int = 10
    num_r: int = 3
    f_maps: int = 64
    f_dim: int = 2048
    out_classes: int = 2
    causal: bool = True
    d_model: int = 64
    d_q: int = 8
    len_q: int = 30
    gest_dim: int = EMBED_DIM
    fast_pool: int = 16
    use_pallas: bool = True
    prompt_path: Optional[str] = None
    use_all_gestures: bool = True
    use_skill_prompt: bool = False
    srm: bool = False
    dtype: object = None      # bfloat16 compute for the TCN/FPN paths
    fused: object = "auto"    # fused Pallas TCN stacks: "auto" (TPU) | True | False

    def _prompt_texts(self):
        from .prompts import GESTURES_OBSERVED, SKILL_LEVEL_PROMPTS

        gestures = GESTURES if self.use_all_gestures else GESTURES_OBSERVED
        if self.use_skill_prompt and not self.srm:
            return tuple(
                f"A self-reported {skill}-skilled surgeon is {g} ..."
                for skill in SKILL_LEVEL_PROMPTS
                for g in gestures
            )
        return gestures

    @nn.compact
    def __call__(
        self, x, train: bool = False
    ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        """x: (1, T, f_dim) one trial. Returns (out_list, f_list):
        out_list = 4 slow FPN logit tracks at T + (1 + num_r) fast tracks at
        T//fast_pool, each (1, T_i, out_classes)."""
        if x.shape[0] != 1:
            raise ValueError("COG processes one trial at a time (B=1)")

        # frozen prompt tables, stored outside 'params' so never trained
        texts = self._prompt_texts()
        gest = self.variable(
            "constants",
            "gest_embed",
            lambda: jnp.asarray(
                load_prompt_embeddings(self.prompt_path, texts, self.gest_dim)
            ),
        ).value

        xx = ChainOfGestureTransformer(
            self.f_dim, self.gest_dim, self.d_model, self.d_q, self.len_q,
            use_pallas=self.use_pallas, name="cot",
        )(gest, x[0], train)  # (T, M*d_model)

        if self.srm:
            from .prompts import SKILL_STATEMENTS

            skill = self.variable(
                "constants",
                "skill_embed",
                lambda: jnp.asarray(
                    load_prompt_embeddings(
                        self.prompt_path.replace("gest", "skill")
                        if self.prompt_path else None,
                        SKILL_STATEMENTS, self.gest_dim,
                    )
                ),
            ).value
            skill_xx = ChainOfGestureTransformer(
                self.f_dim, self.gest_dim, self.d_model, self.d_q, self.len_q,
                use_pallas=self.use_pallas, name="cot_skill",
            )(skill, x[0], train)
            xx = jnp.concatenate([xx, skill_xx], axis=-1)

        xx = xx[None]  # (1, T, M*d_model [+ S*d_model])

        # --- slow path ---
        slow_stages = [COGStage(
            self.num_layers_basic, self.f_maps, self.out_classes,
            self.causal, channel_dropout=True, dtype=self.dtype,
            fused=self.fused, name="TCN",
        )]
        for r in range(self.num_r):
            slow_stages.append(COGStage(
                self.num_layers_r, self.f_maps, self.out_classes,
                self.causal, use_input_conv=False, dtype=self.dtype,
                fused=self.fused, name=f"R{r}",
            ))

        use_fused = (self.fused is True) or (
            self.fused == "auto" and jax.default_backend() == "tpu")
        if use_fused and self.fused != True:  # noqa: E712
            # long trials: exact XLA per-stage fallback past the fused
            # kernels' measured scoped-VMEM T boundary (see tcn_fused)
            from ..ops.tcn_fused import fused_stack_fits

            use_fused = fused_stack_fits(
                xx.shape[1],
                2 ** max(self.num_layers_basic, self.num_layers_r), train)
        if use_fused and self.dtype is None and self.num_r > 0:
            # MERGED slow path: the R stages take features directly (no ops
            # between stages, models_COG.py:482-524), so all stages run in
            # ONE kernel launch per direction (ops/tcn_fused.py multistack);
            # stage outputs feed the FPN exactly as the per-stage loop's.
            # Stage weights/masks ride as PER-STAGE pallas operands — the
            # per-step jnp.concatenate of the 4 stage trees (+ the VJP's
            # grad-splitting slices) was ~110 us of the device profile.
            from ..ops.tcn_fused import dilated_residual_multistack_stages

            out0 = slow_stages[0].pre(xx, train)          # (1, T, C)
            T_len = out0.shape[1]
            ws = [s.stack_weights() for s in slow_stages]
            masks = None
            if train:
                masks = [s.stack_dropout_mask(1, T_len)[:, 0]
                         for s in slow_stages]
            hs = dilated_residual_multistack_stages(
                out0[0], ws, self.num_layers_basic,
                self.num_layers_r, causal=self.causal, masks=masks)
            f_list = [hs[s][None] for s in range(len(slow_stages))]
            # per-stage class convs: logits are unused on the slow path
            # (exactly like the per-stage loop, which discards them), but
            # the params must exist for checkpoint-tree parity — XLA DCEs
            # the dead matmuls
            for s, fs in zip(slow_stages, f_list):
                s.post(fs)
        else:
            f, _ = slow_stages[0](xx, train)
            f_list = [f]
            for r in range(self.num_r):
                f, _ = slow_stages[1 + r](f, train)
                f_list.append(f)

        # FPN upsample-add with a single shared lateral conv
        lat = Conv1d(self.f_maps, 1, dtype=self.dtype, name="latlayer1")
        p = f_list[-1]
        pyramid = [p]
        for c in reversed(f_list[:-1]):
            p = interp1d_linear(p, c.shape[1], axis=1) + lat(c)
            pyramid.insert(0, p)

        conv_out = Conv1d(self.out_classes, 1, dtype=self.dtype, name="conv_out")
        out_list = [conv_out(p).astype(jnp.float32) for p in pyramid]

        # --- fast path ---
        fast = nn.avg_pool(xx, (self.fast_pool,), strides=(self.fast_pool,))
        fast_f, fast_out = COGStage(
            self.num_layers_basic, self.f_maps, self.out_classes,
            self.causal, channel_dropout=True, dtype=self.dtype,
            fused=self.fused, name="fast_stage1",
        )(fast, train)
        f_list.append(fast_f)
        out_list.append(fast_out)
        for r in range(self.num_r):
            fast_f, fast_out = COGStage(
                self.num_layers_r, self.f_maps, self.out_classes,
                self.causal, dtype=self.dtype, fused=self.fused, name=f"fast_R{r}",
            )(nn.softmax(fast_out, axis=-1), train)
            f_list.append(fast_f)
            out_list.append(fast_out)

        return out_list, f_list
