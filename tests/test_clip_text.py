"""CLIP ViT-B/32 text tower: torch-oracle parity + tokenizer goldens.

The oracle reproduces the reference's text branch literally
(openai/CLIP model.py: pre-LN residual attention blocks over
nn.MultiheadAttention with a causal mask, QuickGELU MLP, ln_final, EOT
pooling, bias-free text projection — consumed by models_COG.py:408-445)
with random weights; the JAX tower must match on CPU fp32.
"""

from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from med_tpu.models.clip_text import (  # noqa: E402
    encode_text,
    import_clip_text,
    load_clip_text_params,
)


class _QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class _Block(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.attn = nn.MultiheadAttention(d, h)
        self.ln_1 = nn.LayerNorm(d)
        self.mlp = nn.Sequential(OrderedDict([
            ("c_fc", nn.Linear(d, d * 4)),
            ("gelu", _QuickGELU()),
            ("c_proj", nn.Linear(d * 4, d)),
        ]))
        self.ln_2 = nn.LayerNorm(d)

    def forward(self, x, mask):
        h = self.ln_1(x)
        a, _ = self.attn(h, h, h, need_weights=False, attn_mask=mask)
        x = x + a
        return x + self.mlp(self.ln_2(x))


class _Transformer(nn.Module):
    def __init__(self, d, h, n_layers):
        super().__init__()
        self.resblocks = nn.ModuleList(
            [_Block(d, h) for _ in range(n_layers)])


class _TextTower(nn.Module):
    """Literal CLIP text branch (model.py:343-358), LND layout."""

    def __init__(self, vocab, ctx, d, h, n_layers):
        super().__init__()
        self.token_embedding = nn.Embedding(vocab, d)
        self.positional_embedding = nn.Parameter(torch.empty(ctx, d))
        self.transformer = _Transformer(d, h, n_layers)
        self.ln_final = nn.LayerNorm(d)
        self.text_projection = nn.Parameter(torch.empty(d, d))

    def forward(self, text):
        L = text.shape[1]
        x = self.token_embedding(text) + self.positional_embedding[:L]
        x = x.permute(1, 0, 2)
        mask = torch.full((L, L), float("-inf")).triu_(1)
        for blk in self.transformer.resblocks:
            x = blk(x, mask)
        x = x.permute(1, 0, 2)
        x = self.ln_final(x)
        pooled = x[torch.arange(x.shape[0]), text.argmax(dim=-1)]
        return pooled @ self.text_projection


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.04)
    return model


def _token_batch(rng, B, L, vocab):
    """tokenize-like rows: <sot> ids <eot> 0-pad; EOT = vocab-1 (largest)."""
    ids = np.zeros((B, L), np.int64)
    for r in range(B):
        n = int(rng.integers(3, L - 1))
        ids[r, 0] = vocab - 2
        ids[r, 1:n] = rng.integers(1, vocab - 2, n - 1)
        ids[r, n] = vocab - 1
    return ids


def test_encode_text_matches_torch_oracle(rng):
    vocab, ctx, d, h, layers = 50, 16, 32, 4, 3
    oracle = _randomize(_TextTower(vocab, ctx, d, h, layers), 0).eval()
    ids = _token_batch(rng, 5, ctx, vocab)
    with torch.no_grad():
        want = oracle(torch.from_numpy(ids)).numpy()
    got = np.asarray(encode_text(import_clip_text(oracle.state_dict()),
                                 ids, n_heads=h))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_encode_text_full_vitb32_geometry(rng):
    """One forward at the real ViT-B/32 text geometry (49408 vocab, ctx 77,
    width 512, 8 heads, 12 layers) through the .pt save/load round trip —
    pins the importer against the official state_dict naming + shapes."""
    vocab, ctx, d, h, layers = 49408, 77, 512, 8, 12
    oracle = _randomize(_TextTower(vocab, ctx, d, h, layers), 1).eval()
    ids = _token_batch(rng, 2, ctx, vocab)
    with torch.no_grad():
        want = oracle(torch.from_numpy(ids)).numpy()
    got = np.asarray(encode_text(import_clip_text(oracle.state_dict()), ids))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_load_clip_text_params_pt_and_npz(tmp_path, rng):
    vocab, ctx, d, h, layers = 40, 12, 16, 2, 2
    oracle = _randomize(_TextTower(vocab, ctx, d, h, layers), 2).eval()
    ids = _token_batch(rng, 3, ctx, vocab)
    with torch.no_grad():
        want = oracle(torch.from_numpy(ids)).numpy()

    pt = tmp_path / "clip.pt"
    torch.save(oracle.state_dict(), pt)
    got_pt = np.asarray(encode_text(load_clip_text_params(str(pt)), ids,
                                    n_heads=h))
    np.testing.assert_allclose(got_pt, want, rtol=2e-5, atol=2e-5)

    npz = tmp_path / "clip.npz"
    np.savez(npz, **{k: v.numpy() for k, v in oracle.state_dict().items()})
    got_npz = np.asarray(encode_text(load_clip_text_params(str(npz)), ids,
                                     n_heads=h))
    np.testing.assert_allclose(got_npz, want, rtol=2e-5, atol=2e-5)


# ------------------------------------------------------------------ tokenizer
def _mini_vocab(tmp_path):
    """Merges whose RANK ORDER matters: (l,l) outranks (h,e)."""
    p = tmp_path / "merges.txt"
    p.write_text("#version: 0.2\nl l\nh e\ne l\n")
    return str(p)


def test_tokenizer_merge_order_and_word_final(tmp_path):
    from med_tpu.models.clip_tokenizer import ClipTokenizer

    tok = ClipTokenizer(_mini_vocab(tmp_path))
    # "hello": [h,e,l,l,o</w>] -> rank0 (l,l) first -> [h,e,ll,o</w>]
    # -> rank1 (h,e) -> [he,ll,o</w>]; (e,l) no longer applicable.
    want = [tok.encoder["he"], tok.encoder["ll"], tok.encoder["o</w>"]]
    assert tok.encode("hello") == want
    # unmergeable word: plain byte symbols with the word-final marker
    assert tok.encode("xy") == [tok.encoder["x"], tok.encoder["y</w>"]]
    # cleanup: case-folding + whitespace collapse
    assert tok.encode("  HeLLo \n hello ") == want + want


def test_tokenizer_tokenize_framing_and_truncation(tmp_path):
    from med_tpu.models.clip_tokenizer import ClipTokenizer, EOT, SOT

    tok = ClipTokenizer(_mini_vocab(tmp_path))
    out = tok.tokenize(["hello", "hello hello hello"], context_length=6)
    sot, eot = tok.encoder[SOT], tok.encoder[EOT]
    he, ll, o = (tok.encoder[s] for s in ("he", "ll", "o</w>"))
    np.testing.assert_array_equal(out[0], [sot, he, ll, o, eot, 0])
    # 1 + 9 + 1 ids > 6: truncate, force EOT last
    np.testing.assert_array_equal(out[1], [sot, he, ll, o, he, eot])
    # EOT is the max id, so encode_text's argmax pooling lands on it
    assert eot == max(tok.encoder.values())
    assert out.max(axis=1).tolist() == [eot, eot]

def test_load_prompt_embeddings_clip_source(tmp_path, rng):
    """prompts.py third source: novel prompt strings -> CLIP-tower
    embeddings, ahead of table/surrogate (round-4 VERDICT item 4)."""
    from med_tpu.models.prompts import load_prompt_embeddings

    vocab, ctx, d, h, layers = 40, 12, 16, 2, 2
    # vocab must cover the tokenizer's id space: 512 byte syms + merges + 2
    oracle = _randomize(_TextTower(600, ctx, d, h, layers), 3).eval()
    pt = tmp_path / "clip.pt"
    torch.save(oracle.state_dict(), pt)
    texts = ("hello", "a novel skill-conditioned prompt: xy hello")
    emb = load_prompt_embeddings(
        None, texts=texts, dim=d, clip_ckpt=str(pt),
        bpe_vocab=_mini_vocab(tmp_path))
    assert emb.shape == (2, d) and emb.dtype == np.float32
    assert np.abs(emb[0] - emb[1]).max() > 1e-3
    again = load_prompt_embeddings(
        None, texts=texts, dim=d, clip_ckpt=str(pt),
        bpe_vocab=_mini_vocab(tmp_path))
    np.testing.assert_array_equal(emb, again)
