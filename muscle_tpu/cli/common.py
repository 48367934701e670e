"""Shared CLI plumbing for the five pipeline stages."""

from __future__ import annotations

import argparse
import os

import numpy as np


def add_voc_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--voc12_root", default="data/VOC2012", type=str)
    p.add_argument("--cls_labels", default="data/cls_labels.npy", type=str)
    p.add_argument("--num_classes", default=21, type=int)
    p.add_argument("--num_workers", default=8, type=int)


def load_lists(args, list_path: str):
    from muscle_tpu.data import load_img_name_list, load_label_dict

    names = load_img_name_list(list_path)
    labels = load_label_dict(args.cls_labels)
    return names, labels


def fetch_weights(path_or_url: str, cache_dir: str | None = None) -> str:
    """Resolve a checkpoint argument to a local file: local paths pass
    through; http(s)/file URLs are downloaded once into a cache keyed by
    basename (the reference's operational mode — from_pretrained pulls
    adv-efficientnet weights off GitHub, utils.py:312-322 — made turnkey:
    `--weights <url>` goes straight to a running model with zero edits)."""
    if "://" not in path_or_url:
        return path_or_url
    import urllib.parse
    import urllib.request

    cache_dir = cache_dir or os.environ.get(
        "MUSCLE_TPU_CACHE", os.path.expanduser("~/.cache/muscle_tpu")
    )
    os.makedirs(cache_dir, exist_ok=True)
    name = os.path.basename(urllib.parse.urlparse(path_or_url).path) or "weights.pth"
    dest = os.path.join(cache_dir, name)
    if not os.path.exists(dest):
        tmp = dest + ".part"
        urllib.request.urlretrieve(path_or_url, tmp)
        os.replace(tmp, dest)
    return dest


def load_model_variables(weights: str | None, model, example_shape, mode: str):
    """Init a model and optionally load a checkpoint (.pth torch state dict
    via the converter, or an orbax/msgpack flax checkpoint).  ``weights``
    may be a local path or an http(s) URL (cached, see fetch_weights)."""
    import jax
    import jax.numpy as jnp

    x = jnp.zeros(example_shape, jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, mode=mode)
    if weights:
        weights = fetch_weights(weights)
        if weights.endswith(".pth") or weights.endswith(".ckpt"):
            from muscle_tpu.convert import convert_muscle_state_dict, load_torch_checkpoint

            sd = load_torch_checkpoint(weights)
            loaded = convert_muscle_state_dict(sd)
            variables = _merge_loaded(variables, loaded)
        elif weights.endswith(".msgpack"):
            from muscle_tpu.training.state import load_model_msgpack

            variables = load_model_msgpack(weights, variables)
        else:
            raise ValueError(
                f"unrecognised checkpoint {weights!r}: expected a torch .pth/"
                ".ckpt or a muscle_tpu model_*.msgpack"
            )
    return variables


def _merge_loaded(init_vars, loaded):
    """strict=False semantics: loaded keys override, missing keys keep their
    fresh initialisation (reference load_state_dict(strict=False))."""
    import flax

    flat_init = flax.traverse_util.flatten_dict(init_vars)
    flat_new = flax.traverse_util.flatten_dict(loaded)
    for k, v in flat_new.items():
        if k in flat_init:
            if flat_init[k].shape != v.shape:
                raise ValueError(f"shape mismatch for {k}: {flat_init[k].shape} vs {v.shape}")
            flat_init[k] = v
    return flax.traverse_util.unflatten_dict(flat_init)


def save_score_dict(path: str, d: dict) -> None:
    np.save(path, d)  # dict of {class_idx: (H, W)} arrays, reference format


def sort_by_orientation(names: list[str], voc12_root: str) -> list[str]:
    """Stable-sort an inference list landscape-first (header-only PIL reads,
    no pixel decode).  Batches become orientation-homogeneous, so the TTA
    engines' rectangular per-batch canvases (inference/cam.py
    _batch_canvas) drop the ~25% of conv FLOPs the square canvas spends on
    padding.  Pure scheduling — per-image outputs are unchanged."""
    from PIL import Image

    from muscle_tpu.data.voc12 import get_img_path

    def is_portrait(n: str) -> bool:
        with Image.open(get_img_path(n, voc12_root)) as im:
            w, h = im.size
        return h > w

    return sorted(names, key=is_portrait)


def prefetch_chunks(items: list, batch_size: int, load_fn, depth: int = 2):
    """Yield (chunk, load_fn(chunk)) over consecutive chunks, loading ahead
    in one worker thread.  JPEG decode + canvas packing would otherwise sit
    on the dispatch critical path (~50 ms/batch on one core); the main
    thread spends most of its time blocked on device IO (GIL released), so
    a single prefetch thread hides host prep even on a 1-vCPU host."""
    import collections
    import itertools
    from concurrent.futures import ThreadPoolExecutor

    chunks = [items[i : i + batch_size] for i in range(0, len(items), batch_size)]
    with ThreadPoolExecutor(1) as ex:
        pending = collections.deque()
        it = iter(chunks)
        for c in itertools.islice(it, depth):
            pending.append((c, ex.submit(load_fn, c)))
        for nxt in it:
            c, f = pending.popleft()
            yield c, f.result()
            pending.append((nxt, ex.submit(load_fn, nxt)))
        while pending:
            c, f = pending.popleft()
            yield c, f.result()
