"""ControlNet training data — fill50k-style synthetic circles + toy tokenizer.

Parity target: controlnet/tutorial_dataset.py (fill50k: source = circle
outline, target = color-filled circle on colored background, prompt
"<fill color> circle with <background color> background"). The real dataset
is 50k rendered PNG pairs; this procedural equivalent renders the same
structure on the fly so the ControlLDM training loop (tutorial_train.py)
runs end-to-end without downloads.

Images follow the SD convention: target in [-1, 1], hint in [0, 1]
(ldm/models/diffusion/ddpm.py get_input; cldm.py:314-326).
"""
from __future__ import annotations

from typing import Dict, Iterator, List, Tuple

import numpy as np

# color name → RGB, the prompt vocabulary's content words
COLORS: List[Tuple[str, Tuple[int, int, int]]] = [
    ("red", (220, 40, 40)), ("green", (40, 200, 60)), ("blue", (50, 80, 230)),
    ("yellow", (230, 220, 50)), ("cyan", (60, 220, 220)),
    ("magenta", (220, 60, 220)), ("white", (240, 240, 240)),
    ("orange", (240, 150, 40)), ("purple", (140, 60, 200)),
    ("teal", (40, 140, 140)),
]

# toy word-level tokenizer: CLIP-style special tokens + fixed vocabulary
_WORDS = (["<start>", "<end>", "<pad>", "circle", "with", "background"]
          + [name for name, _ in COLORS])
VOCAB: Dict[str, int] = {w: i for i, w in enumerate(_WORDS)}
MAX_LEN = 77


def tokenize(prompt: str, max_len: int = MAX_LEN) -> np.ndarray:
    """Word-level CLIP-like tokenization: <start> words <end> <pad>*."""
    ids = [VOCAB["<start>"]]
    for w in prompt.lower().split():
        ids.append(VOCAB.get(w, VOCAB["<pad>"]))
    ids.append(VOCAB["<end>"])
    ids = ids[:max_len]
    ids += [VOCAB["<pad>"]] * (max_len - len(ids))
    return np.asarray(ids, np.int32)


class SyntheticFill50k:
    """Procedural fill50k: (hint = outline, image = filled, prompt)."""

    def __init__(self, size: int = 64, length: int = 1000,
                 max_len: int = MAX_LEN):
        self.size = size
        self.length = length
        self.max_len = max_len

    def __len__(self):
        return self.length

    def load(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(idx)
        s = self.size
        fill_i, bg_i = rng.choice(len(COLORS), 2, replace=False)
        fill_name, fill_rgb = COLORS[fill_i]
        bg_name, bg_rgb = COLORS[bg_i]
        cx, cy = rng.uniform(0.3, 0.7, 2) * s
        rad = rng.uniform(0.15, 0.35) * s

        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
        dist = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
        inside = dist < rad
        ring = np.abs(dist - rad) < max(1.0, s / 64.0)

        target = np.empty((s, s, 3), np.float32)
        target[:] = np.asarray(bg_rgb, np.float32)
        target[inside] = np.asarray(fill_rgb, np.float32)
        hint = np.zeros((s, s, 3), np.float32)
        hint[ring] = 255.0

        prompt = f"{fill_name} circle with {bg_name} background"
        return {
            "image": (target / 127.5 - 1.0).astype(np.float32),  # [-1, 1]
            "hint": (hint / 255.0).astype(np.float32),  # [0, 1]
            "ids": tokenize(prompt, self.max_len),
        }


class Fill50kDataset:
    """Real fill50k PNG pairs from disk.

    Parity target: controlnet/tutorial_dataset.py:1-40 — reads
    ``data_root/prompt.json`` (JSON-lines of {"source", "target", "prompt"}),
    loads the source as the [0,1] hint and the target as the [-1,1] image.
    Images are bilinearly resized to ``size`` (the reference trains at the
    native 512; our presets train smaller)."""

    def __init__(self, data_root: str, size: int = 64, max_len: int = MAX_LEN):
        import json
        import os

        self.data_root = data_root
        self.size = size
        self.max_len = max_len
        self.items: List[dict] = []
        path = os.path.join(data_root, "prompt.json")
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        self.items.append(json.loads(line))

    def __len__(self):
        return len(self.items)

    def load(self, idx: int) -> Dict[str, np.ndarray]:
        import os

        from PIL import Image

        item = self.items[idx]
        s = self.size

        def _load(rel):
            im = Image.open(os.path.join(self.data_root, rel)).convert("RGB")
            if im.size != (s, s):
                im = im.resize((s, s), Image.BILINEAR)
            return np.asarray(im, np.float32)

        return {
            "image": (_load(item["target"]) / 127.5 - 1.0).astype(np.float32),
            "hint": (_load(item["source"]) / 255.0).astype(np.float32),
            "ids": tokenize(item["prompt"], self.max_len),
        }


def device_fill50k_batch(key, batch: int, size: int):
    """On-device procedural fill50k batch — the TPU-native feed path.

    Same generative family as :class:`SyntheticFill50k` (uniform circle
    center in [0.3,0.7]·s, radius in [0.15,0.35]·s, two distinct palette
    colors), re-derived in pure jnp so a training loop can `lax.scan` over
    steps with the data generated ON CHIP. This removes the host↔device
    round-trip per step entirely — through the sandboxed TPU relay every host dispatch
    re-ships the params (~100 MB for the 'small' stack ⇒ a 0.5 steps/s
    ceiling vs the chip's 100+), and on real multi-host pods it removes the
    per-step infeed. Held-out eval keeps using the numpy loader, so train
    and eval data come from independent implementations of the same family.

    Returns (image [b,s,s,3] in [-1,1], hint [b,s,s,3] in [0,1],
    ids [b,77] int32) matching SyntheticFill50k.load's contract.
    """
    import jax
    import jax.numpy as jnp

    palette = jnp.asarray([rgb for _, rgb in COLORS], jnp.float32)  # [10,3]
    n = len(COLORS)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    fill_i = jax.random.randint(k1, (batch,), 0, n)
    # distinct bg: uniform over the other n-1 colors
    bg_i = (fill_i + jax.random.randint(k2, (batch,), 1, n)) % n
    cxy = jax.random.uniform(k3, (batch, 2), minval=0.3, maxval=0.7) * size
    rad = jax.random.uniform(k4, (batch,), minval=0.15, maxval=0.35) * size

    yy, xx = jnp.mgrid[0:size, 0:size]
    dist = jnp.sqrt((xx[None].astype(jnp.float32) - cxy[:, 0, None, None]) ** 2
                    + (yy[None].astype(jnp.float32)
                       - cxy[:, 1, None, None]) ** 2)
    inside = dist < rad[:, None, None]
    ring = jnp.abs(dist - rad[:, None, None]) < max(1.0, size / 64.0)

    fill_rgb = palette[fill_i][:, None, None, :]
    bg_rgb = palette[bg_i][:, None, None, :]
    image = jnp.where(inside[..., None], fill_rgb, bg_rgb) / 127.5 - 1.0
    hint = jnp.broadcast_to(ring[..., None],
                            image.shape).astype(jnp.float32)

    # "<fill> circle with <bg> background" under the toy VOCAB: color token
    # ids are contiguous starting at VOCAB['red'] (=6)
    c0 = VOCAB[COLORS[0][0]]
    base = np.full((MAX_LEN,), VOCAB["<pad>"], np.int32)
    base[:7] = [VOCAB["<start>"], 0, VOCAB["circle"], VOCAB["with"], 0,
                VOCAB["background"], VOCAB["<end>"]]
    ids = jnp.broadcast_to(jnp.asarray(base), (batch, MAX_LEN))
    ids = ids.at[:, 1].set(c0 + fill_i).at[:, 4].set(c0 + bg_i)
    return image.astype(jnp.float32), hint, ids


def controlnet_batch_iterator(
    ds, batch_size: int, seed: int = 0, rank: int = 0, world: int = 1,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite iterator over (image, hint, ids) batches. GLOBAL batch_size;
    with world > 1 each process yields its rank's slice."""
    assert batch_size % world == 0
    local = batch_size // world
    epoch, cursor = 0, 0
    while True:
        order = np.random.default_rng(seed + epoch).permutation(len(ds))
        batch = {"image": [], "hint": [], "ids": []}
        for i in range(rank * local, (rank + 1) * local):
            sample = ds.load(int(order[(cursor + i) % len(ds)]))
            for k in batch:
                batch[k].append(sample[k])
        yield {k: np.stack(v) for k, v in batch.items()}
        cursor += batch_size
        if cursor >= len(ds):
            cursor, epoch = 0, epoch + 1
