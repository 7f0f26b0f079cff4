"""End-to-end COG logit parity vs a full torch oracle.

The oracle transcribes the complete reference forward (models_COG.py:482-524:
chain-of-thought block -> slow TCN + R stages + single-shared-lateral FPN
(:217-219) -> per-level conv_out, and the 16x-pooled fast path :513-522) with
the reference's exact state_dict key names, so one module both (a) pins all
4 slow + (1 + num_R) fast logit tracks and (b) exercises
``import_reference_checkpoint`` for COG — the strongest form of the SURVEY §7
parity harness ("import reference weights, compare logits").
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from med_tpu.models.cog import COG  # noqa: E402
from med_tpu.utils.torch_port import import_reference_checkpoint  # noqa: E402

# small-but-faithful oracle configuration (reference shape: num_R=3 so the
# FPN's literal p4..p1 indexing applies; T non-multiple of the fast pool)
D_MODEL, D_Q, HEADS, LEN_Q = 16, 2, 8, 5
F_DIM, GEST_DIM, F_MAPS, N_CLS = 12, 16, 8, 2
NLB, NLR, NUM_R, POOL, M, T = 2, 2, 3, 4, 15, 37


class RefDilatedResidual(tnn.Module):
    """models_TCN.py:104-137 (causal): pad both sides, trim the right tail."""

    def __init__(self, dilation, ch):
        super().__init__()
        self.conv_dilated = tnn.Conv1d(ch, ch, 3, padding=dilation * 2,
                                       dilation=dilation)
        self.conv_1x1 = tnn.Conv1d(ch, ch, 1)
        self.dilation = dilation

    def forward(self, x):
        out = tF.relu(self.conv_dilated(x))
        out = out[:, :, :-(self.dilation * 2)]
        return x + self.conv_1x1(out)  # dropout: eval => identity


class RefStage(tnn.Module):
    """SingleStageModel1_COG (models_COG.py:50-98); hier pool k=1 is a no-op
    and channel dropout is identity at eval, so both are omitted."""

    def __init__(self, num_layers, f_maps, dim, n_classes, use_output):
        super().__init__()
        if use_output:
            self.conv_1x1 = tnn.Conv1d(dim, f_maps, 1)
        self.layers = tnn.ModuleList(
            [RefDilatedResidual(2 ** i, f_maps) for i in range(num_layers)])
        self.conv_out_classes = tnn.Conv1d(f_maps, n_classes, 1)
        self.use_output = use_output

    def forward(self, x):
        out = self.conv_1x1(x) if self.use_output else x
        for layer in self.layers:
            out = layer(out)
        return out, self.conv_out_classes(out)


class RefFFN(tnn.Module):
    """PoswiseFeedForwardNet (models_TCN.py:235-251): unlearned closing LN."""

    def __init__(self, d_model, d_ff):
        super().__init__()
        self.fc = tnn.Sequential(tnn.Linear(d_model, d_ff, bias=False),
                                 tnn.ReLU(),
                                 tnn.Linear(d_ff, d_model, bias=False))
        self.d_model = d_model

    def forward(self, x):
        return tF.layer_norm(self.fc(x) + x, (self.d_model,))


class RefMHA_COG(tnn.Module):
    """MultiHeadAttention_COG (models_COG.py:14-47): fc defined, never
    applied; heads concatenated raw; unlearned closing LN."""

    def __init__(self, d_model, d_q, h):
        super().__init__()
        self.W_Q = tnn.Linear(d_model, d_q * h, bias=False)
        self.W_K = tnn.Linear(d_model, d_q * h, bias=False)
        self.W_V = tnn.Linear(d_model, d_q * h, bias=False)
        self.fc = tnn.Linear(h * d_q, d_model, bias=False)
        self.d_q, self.h, self.d_model = d_q, h, d_model

    def forward(self, q_in, k_in, v_in):
        B = q_in.size(0)
        q = self.W_Q(q_in).view(B, -1, self.h, self.d_q).transpose(1, 2)
        k = self.W_K(k_in).view(B, -1, self.h, self.d_q).transpose(1, 2)
        v = self.W_V(v_in).view(B, -1, self.h, self.d_q).transpose(1, 2)
        s = q @ k.transpose(-1, -2) / np.sqrt(self.d_q)
        ctx = torch.softmax(s, -1) @ v
        ctx = ctx.transpose(1, 2).reshape(B, -1, self.h * self.d_q)
        return tF.layer_norm(ctx + q_in, (self.d_model,))


class RefEncoderLayer(tnn.Module):
    """EncoderLayer_COG (models_COG.py:222-240): learned norm1/norm3."""

    def __init__(self, d_model, d_ff, d_q, h):
        super().__init__()
        self.norm1 = tnn.LayerNorm(d_model)
        self.norm3 = tnn.LayerNorm(d_model)
        self.enc_self_attn = RefMHA_COG(d_model, d_q, h)
        self.pos_ffn = RefFFN(d_model, d_ff)

    def forward(self, Q, K, V):
        Q = self.norm1(Q)
        out = self.enc_self_attn(Q, K, V)
        return self.pos_ffn(self.norm3(out))


class RefEncoder(tnn.Module):
    """Encoder_COG (models_COG.py:242-258): learned norm on the windowed
    visual; every layer attends the same normed visual."""

    def __init__(self, d_model, d_ff, d_q, n_layers, h):
        super().__init__()
        self.norm = tnn.LayerNorm(d_model)
        self.layers = tnn.ModuleList(
            [RefEncoderLayer(d_model, d_ff, d_q, h) for _ in range(n_layers)])

    def forward(self, visual, text):
        visual = self.norm(visual)
        for layer in self.layers:
            text = layer(text, visual, visual)
        return text


class RefTransformerCOT(tnn.Module):
    """TransformerCOT (models_COG.py:100-122)."""

    def __init__(self, d_model, d_ff, d_q, n_layers, h):
        super().__init__()
        self.layer1 = RefEncoder(d_model, d_ff, d_q, n_layers, h)
        self.atten = RefMHA_COG(d_model, d_model, 1)

    def forward(self, visual, text):
        enc = self.layer1(visual, text)
        return self.atten(enc, text, text)


class RefMyTransformer(tnn.Module):
    """MyTransformer (models_COG.py:125-176): per-frame zero-padded windows."""

    def __init__(self, f_dim, gest_dim, d_model, d_q, len_q):
        super().__init__()
        self.linear1 = tnn.Linear(f_dim, d_model, bias=False)
        self.linear2 = tnn.Linear(gest_dim, d_model, bias=False)
        self.transformer = RefTransformerCOT(d_model, f_dim, d_q, 2, HEADS)
        self.len_q, self.d_model = len_q, d_model

    def forward(self, g, long_feature):
        visual = self.linear1(long_feature)   # (1, T, d)
        text = self.linear2(g)                # (1, M, d)
        T_ = visual.size(1)
        wins = []
        for i in range(T_):
            if i < self.len_q - 1:
                w = torch.cat(
                    [torch.zeros(1, self.len_q - 1 - i, self.d_model),
                     visual[:, : i + 1]], 1)
            else:
                w = visual[:, i - self.len_q + 1 : i + 1]
            wins.append(w)
        vis = torch.stack(wins, 0).squeeze(1)             # (T, len_q, d)
        txt = text.expand(T_, -1, -1).contiguous()        # (T, M, d)
        out = self.transformer(vis, txt)                  # (T, M, d)
        return out.reshape(T_, -1).unsqueeze(0)           # (1, T, M*d)


class RefFPN(tnn.Module):
    """FPN (models_COG.py:179-220): latlayer2/3 defined but never applied."""

    def __init__(self, f):
        super().__init__()
        self.latlayer1 = tnn.Conv1d(f, f, 1)
        self.latlayer2 = tnn.Conv1d(f, f, 1)
        self.latlayer3 = tnn.Conv1d(f, f, 1)

    def _up(self, x, y):
        return tF.interpolate(x, size=y.size(2), mode="linear") + y

    def forward(self, fl):
        p4 = fl[3]
        p3 = self._up(p4, self.latlayer1(fl[2]))
        p2 = self._up(p3, self.latlayer1(fl[1]))
        p1 = self._up(p2, self.latlayer1(fl[0]))
        return [p1, p2, p3, p4]


class RefCOG(tnn.Module):
    """Full COG (models_COG.py:261-524) with the reference's key names."""

    def __init__(self):
        super().__init__()
        self.all_action_fea = tnn.Parameter(
            torch.randn(M, GEST_DIM), requires_grad=False)
        self.cot = RefMyTransformer(F_DIM, GEST_DIM, D_MODEL, D_Q, LEN_Q)
        self.TCN = RefStage(NLB, F_MAPS, M * D_MODEL, N_CLS, use_output=True)
        self.Rs = tnn.ModuleList(
            [RefStage(NLR, F_MAPS, N_CLS, N_CLS, use_output=False)
             for _ in range(NUM_R)])
        self.pool = tnn.AvgPool1d(POOL, POOL)
        self.fast_stage1 = RefStage(NLB, F_MAPS, M * D_MODEL, N_CLS,
                                    use_output=True)
        self.fast_Rs = tnn.ModuleList(
            [RefStage(NLR, F_MAPS, N_CLS, N_CLS, use_output=True)
             for _ in range(NUM_R)])
        self.conv_out = tnn.Conv1d(F_MAPS, N_CLS, 1)
        self.fpn = RefFPN(F_MAPS)

    def forward(self, x):
        xx = self.cot(self.all_action_fea.unsqueeze(0), x)
        xx = xx.permute(0, 2, 1)
        out_list, f_list = [], []
        f, _ = self.TCN(xx)
        f_list.append(f)
        for R in self.Rs:
            f, _ = R(f)
            f_list.append(f)
        f_list = self.fpn(f_list)
        for f in f_list:
            out_list.append(self.conv_out(f))
        fast_f, fast_out = self.fast_stage1(self.pool(xx))
        out_list.append(fast_out)
        for R in self.fast_Rs:
            fast_f, fast_out = R(torch.softmax(fast_out, dim=1))
            out_list.append(fast_out)
        return out_list


def test_cog_full_logit_parity(tmp_path, rng):
    torch.manual_seed(0)
    oracle = RefCOG().eval()
    # randomize learned-LN affines so the pad-row beta path is exercised
    with torch.no_grad():
        for mod in oracle.modules():
            if isinstance(mod, tnn.LayerNorm):
                mod.weight.copy_(torch.tensor(
                    rng.normal(1.0, 0.2, mod.weight.shape), dtype=torch.float32))
                mod.bias.copy_(torch.tensor(
                    rng.normal(0.0, 0.3, mod.bias.shape), dtype=torch.float32))

    feats = rng.normal(size=(1, T, F_DIM)).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy().transpose(0, 2, 1)  # (1, C, T) -> (1, T, C)
                for t in oracle(torch.tensor(feats))]

    path = str(tmp_path / "best_model_LOSO_1Out.pt")
    torch.save({"feature_extractor": None, "model": oracle.state_dict()}, path)
    imported = import_reference_checkpoint(path, "COG")

    model = COG(
        num_layers_basic=NLB, num_layers_r=NLR, num_r=NUM_R, f_maps=F_MAPS,
        f_dim=F_DIM, out_classes=N_CLS, d_model=D_MODEL, d_q=D_Q,
        len_q=LEN_Q, gest_dim=GEST_DIM, fast_pool=POOL, use_pallas=False,
    )
    out_list, _ = model.apply(
        {"params": imported["params"]["model"],
         "constants": imported["constants"]["model"]},
        jnp.asarray(feats), train=False,
    )
    assert len(out_list) == len(want) == 4 + 1 + NUM_R
    # frozen prompt table came through the importer (constants, not params)
    np.testing.assert_array_equal(
        np.asarray(imported["constants"]["model"]["gest_embed"]),
        oracle.all_action_fea.detach().numpy())
    for k, (got, w) in enumerate(zip(out_list, want)):
        np.testing.assert_allclose(
            np.asarray(got), w, rtol=1e-4, atol=1e-4,
            err_msg=f"track {k} (of 4 slow + {1 + NUM_R} fast)")
