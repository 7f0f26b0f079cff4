"""Frozen language-prompt embeddings for COG.

The reference encodes 15 gesture prompts (and optionally 15 skill statements)
with the CLIP ViT-B/32 text encoder *at model construction*, saves them to
``gest_prompt.pt``, and freezes them as non-trainable parameters
(models_COG.py:408-445). The embeddings therefore act as fixed 512-d anchor
vectors — the model only ever consumes them through a trainable bias-free
projection (models_COG.py:151), so any fixed, well-conditioned table works;
training adapts the projection.

This module ships that behavior without a CLIP runtime dependency. Three
embedding sources, in priority order:

1. the JAX CLIP text tower (:mod:`med_tpu.models.clip_text`), when a CLIP
   checkpoint (+ BPE merges file) is supplied — via the ``clip_ckpt`` /
   ``clip_bpe`` arguments or the ``MED_TPU_CLIP_CKPT`` /
   ``MED_TPU_CLIP_BPE`` environment variables. This is the only source
   that gives *novel* prompt text (e.g. the runtime-built skill-conditioned
   prompts, models_COG.py:404-406) a semantically meaningful embedding;
2. a precomputed table file (``.npy``, or a torch ``.pt`` exported from the
   reference's ``gest_prompt.pt``);
3. a deterministic surrogate table (seeded Gaussian, row-normalized to the
   typical CLIP text-embedding norm), so runs are always reproducible.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

GESTURES = (
    "reaching for needle with right hand",
    "positioning needle",
    "pushing needle through tissue",
    "transferring needle from left to right",
    "moving to center with needle in grip",
    "pulling suture with left hand",
    "pulling suture with right hand",
    "orienting needle",
    "using right hand to help tighten suture",
    "loosening more suture",
    "dropping suture at end and moving to end points",
    "reaching for needle with left hand",
    "making C loop around right hand",
    "reaching for suture with right hand",
    "pulling suture with both hands",
)

# The reduced gesture set (only gestures observed in the dataset,
# reference models_COG.py:392-403).
GESTURES_OBSERVED = (
    "reaching for needle with right hand",
    "positioning needle",
    "pushing needle through tissue",
    "transferring needle from left to right",
    "moving to center with needle in grip",
    "pulling suture with left hand",
    "orienting needle",
    "using right hand to help tighten suture",
)

SKILL_STATEMENTS = (
    "Surgeon frequently uses excessive force on the tissue",
    "Surgeon had careful tissue handling but occasionally caused inadvertent damage",
    "Surgeon consistently respects the tissue",
    "Surgeon is awkward and unsure with repeated entanglement and poor knot tying",
    "Surgeon placed majority of knots with appropriate tension",
    "Surgeon has excellent suture control",
    "Surgeon made unnecessary moves",
    "Surgeon had efficient time/motion but some unnecessary moves",
    "Surgeon has a clear economy of movement and maximum efficiency",
    "Surgeon frequently interrupts the flow",
    "Surgeon demonstrates some forward planning and reasonable procedure progression",
    "Surgeon has efficient transitions in procedure",
    "Surgeon overall performance is poor",
    "Surgeon overall performance is competent",
    "Surgeon overall performance is clearly superior",
)

SKILL_LEVEL_PROMPTS = ("novice", "intermediate", "expert")

EMBED_DIM = 512
_CLIP_TYPICAL_NORM = 9.0  # typical L2 norm of CLIP ViT-B/32 text embeddings


def _surrogate_table(texts, dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic per-text embedding: Gaussian seeded by the text hash,
    scaled to the typical CLIP embedding norm."""
    import hashlib

    rows = []
    for t in texts:
        # hash() is salted per-process; use a stable digest
        h = int(hashlib.sha256(t.encode()).hexdigest()[:8], 16)
        r = np.random.default_rng(h).standard_normal(dim)
        rows.append(r / np.linalg.norm(r) * _CLIP_TYPICAL_NORM)
    return np.stack(rows).astype(np.float32)


def encode_texts(clip_params: dict, token_ids, n_heads: int = 8) -> np.ndarray:
    """Encode pre-tokenized prompts with the JAX CLIP text tower:
    (B, L) int ids -> (B, 512) fp32 embeddings."""
    import jax

    from .clip_text import encode_text

    fn = jax.jit(encode_text, static_argnames="n_heads")
    return np.asarray(fn(clip_params, np.asarray(token_ids), n_heads=n_heads),
                      np.float32)


def encode_prompt_strings(clip_ckpt: str, texts, bpe_vocab: str) -> np.ndarray:
    """Text -> embeddings from our own code (reference models_COG.py:408-445
    at construction time): BPE-tokenize then run the JAX text tower."""
    from .clip_text import load_clip_text_params
    from .clip_tokenizer import ClipTokenizer

    params = load_clip_text_params(clip_ckpt)
    tok = ClipTokenizer(bpe_vocab)
    # context length = the checkpoint's positional table (77 for ViT-B/32)
    ctx = int(np.asarray(params["positional_embedding"]).shape[0])
    return encode_texts(params, tok.tokenize(list(texts), ctx))


def load_prompt_embeddings(
    path: Optional[str] = None, texts=GESTURES, dim: int = EMBED_DIM,
    clip_ckpt: Optional[str] = None, bpe_vocab: Optional[str] = None,
) -> np.ndarray:
    """Load prompt embeddings: CLIP tower > table file > surrogate (module
    docstring). ``path`` accepts ``.npy``/``.npz`` or a torch-saved tensor
    (the reference's ``gest_prompt.pt``) when torch is importable.
    """
    clip_ckpt = clip_ckpt or os.environ.get("MED_TPU_CLIP_CKPT")
    bpe_vocab = bpe_vocab or os.environ.get("MED_TPU_CLIP_BPE")
    if (clip_ckpt and bpe_vocab and os.path.exists(clip_ckpt)
            and os.path.exists(bpe_vocab)):
        emb = encode_prompt_strings(clip_ckpt, texts, bpe_vocab)
        if emb.shape[1] != dim:
            raise ValueError(
                f"CLIP tower width {emb.shape[1]} != requested dim {dim}")
        return emb
    if path and os.path.exists(path):
        if path.endswith(".npy"):
            emb = np.load(path)
        elif path.endswith(".npz"):
            emb = np.load(path)["embeddings"]
        else:
            import torch

            emb = torch.load(path, map_location="cpu", weights_only=False)
            emb = np.asarray(emb.detach().numpy() if hasattr(emb, "detach") else emb)
        emb = emb.astype(np.float32)
        if emb.shape != (len(texts), dim):
            raise ValueError(
                f"prompt embedding shape {emb.shape} != {(len(texts), dim)}"
            )
        return emb
    return _surrogate_table(texts, dim)
