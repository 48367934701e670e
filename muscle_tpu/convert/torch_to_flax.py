"""PyTorch checkpoint -> Flax variable converter.

The reference publishes weights as torch ``state_dict`` .pth files (MCL /
MuSCLe checkpoints, adv-efficientnet backbones, IRN weights — see reference
src/efficientnet_pytorch/utils.py:312-334, infer_mcl.py:76-79,
infer_irn.py:41).  This module maps those key spaces onto the NHWC Flax
modules in :mod:`muscle_tpu.models`, enabling bit-level parity gating against
the PyTorch reference.

Layout conversions:
  conv      (O, I, kh, kw)  -> (kh, kw, I, O)
  depthwise (C, 1, kh, kw)  -> (kh, kw, 1, C)   (same transpose)
  linear    (out, in)       -> (in, out)
  batchnorm weight/bias     -> scale/bias;  running stats -> batch_stats
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Load a .pth state dict into numpy arrays (accepts both raw state
    dicts and Lightning-style {'state_dict': ...} files, like the reference
    loaders at infer_mcl.py:76-79)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj and not any(
        k.endswith(".weight") for k in obj
    ):
        obj = obj["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items() if hasattr(v, "detach")}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


class _Translator:
    def __init__(self) -> None:
        self.params: dict = {}
        self.batch_stats: dict = {}
        self.unused: list[str] = []

    def conv(self, path, w, b=None):
        _set(self.params, path + ("kernel",), _conv_kernel(w))
        if b is not None:
            _set(self.params, path + ("bias",), b)

    def dense(self, path, w, b=None):
        _set(self.params, path + ("kernel",), np.ascontiguousarray(w.T))
        if b is not None:
            _set(self.params, path + ("bias",), b)

    def bn(self, path, sd, torch_prefix):
        _set(self.params, path + ("scale",), sd[torch_prefix + ".weight"])
        _set(self.params, path + ("bias",), sd[torch_prefix + ".bias"])
        _set(self.batch_stats, path + ("mean",), sd[torch_prefix + ".running_mean"])
        _set(self.batch_stats, path + ("var",), sd[torch_prefix + ".running_var"])

    def gn(self, path, sd, torch_prefix):
        _set(self.params, path + ("scale",), sd[torch_prefix + ".weight"])
        _set(self.params, path + ("bias",), sd[torch_prefix + ".bias"])

    def variables(self) -> dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}


def _convert_efficientnet(t: _Translator, sd: Mapping[str, np.ndarray], src: str, dst: tuple[str, ...]) -> None:
    """Translate an EfficientNet subtree (torch prefix ``src`` e.g.
    'backbone.') into the flax subtree rooted at ``dst``."""
    t.conv(dst + ("_conv_stem",), sd[src + "_conv_stem.weight"])
    t.bn(dst + ("_bn0",), sd, src + "_bn0")
    block_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(re.escape(src) + r"_blocks\.(\d+)\.", k))
        }
    )
    for i in block_ids:
        bsrc = f"{src}_blocks.{i}."
        bdst = dst + (f"_blocks_{i}",)
        if bsrc + "_expand_conv.weight" in sd:
            t.conv(bdst + ("_expand_conv",), sd[bsrc + "_expand_conv.weight"])
            t.bn(bdst + ("_bn0",), sd, bsrc + "_bn0")
        t.conv(bdst + ("_depthwise_conv",), sd[bsrc + "_depthwise_conv.weight"])
        t.bn(bdst + ("_bn1",), sd, bsrc + "_bn1")
        if bsrc + "_se_reduce.weight" in sd:
            t.conv(bdst + ("_se_reduce",), sd[bsrc + "_se_reduce.weight"], sd[bsrc + "_se_reduce.bias"])
            t.conv(bdst + ("_se_expand",), sd[bsrc + "_se_expand.weight"], sd[bsrc + "_se_expand.bias"])
        t.conv(bdst + ("_project_conv",), sd[bsrc + "_project_conv.weight"])
        t.bn(bdst + ("_bn2",), sd, bsrc + "_bn2")


def convert_muscle_state_dict(sd: Mapping[str, np.ndarray]) -> dict[str, Any]:
    """Convert a MuSCLe (or bare EfficientNet backbone) torch state dict.

    Handles both 'enc' checkpoints (fuse/fc heads) and 'dec' checkpoints
    (BIFPN + fuse_dec), matching the module layout of
    :class:`muscle_tpu.models.MuSCLe`.
    """
    t = _Translator()
    prefix = "backbone." if any(k.startswith("backbone.") for k in sd) else ""
    _convert_efficientnet(t, sd, prefix, ("backbone",))

    if "fuse.weight" in sd:
        t.conv(("fuse",), sd["fuse.weight"], sd["fuse.bias"])
    if "fc.weight" in sd:
        t.dense(("fc",), sd["fc.weight"])
    if "fuse_dec.weight" in sd:
        t.conv(("fuse_dec",), sd["fuse_dec.weight"], sd["fuse_dec.bias"])

    if any(k.startswith("BIFPN.") for k in sd):
        for k in ("inp3", "inp4", "inp5", "inp6", "inp7"):
            t.conv(("BIFPN", k, "conv"), sd[f"BIFPN.{k}.0.weight"], sd[f"BIFPN.{k}.0.bias"])
            t.bn(("BIFPN", k, "bn"), sd, f"BIFPN.{k}.1")
        layer_ids = sorted(
            {
                int(m.group(1))
                for k in sd
                if (m := re.match(r"BIFPN\.BIFPN_Layers\.(\d+)\.", k))
            }
        )
        for i in layer_ids:
            lsrc = f"BIFPN.BIFPN_Layers.{i}."
            ldst = ("BIFPN", f"layer_{i}")
            for k in ("convp67", "convp56", "convp45", "convp34"):
                t.conv(ldst + (k, "conv"), sd[lsrc + k + ".0.weight"], sd[lsrc + k + ".0.bias"])
            for k in ("out4", "out5", "out6", "out7"):
                t.conv(ldst + (k, "conv"), sd[lsrc + k + ".0.weight"], sd[lsrc + k + ".0.bias"])
                t.bn(ldst + (k, "bn"), sd, lsrc + k + ".1")
    return t.variables()


class _Inverter:
    """Inverse of :class:`_Translator`: reads the flax tree and emits a
    torch ``state_dict`` with the layout transforms undone.  Exists so the
    fidelity gates can run the torch reference AS ORACLE on weights we
    trained (gates on the gate-6 trained checkpoint) — the forward
    converter alone can only gate random-init or published weights."""

    def __init__(self, variables: Mapping[str, Any]) -> None:
        self.params = variables["params"]
        self.stats = variables.get("batch_stats", {})
        self.sd: dict[str, np.ndarray] = {}

    @staticmethod
    def _get(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return np.asarray(node)

    def has(self, path) -> bool:
        node = self.params
        for p in path:
            if p not in node:
                return False
            node = node[p]
        return True

    def conv(self, path, key, bias: bool = False):
        k = self._get(self.params, path + ("kernel",))
        self.sd[key + ".weight"] = np.ascontiguousarray(k.transpose(3, 2, 0, 1))
        if bias:
            self.sd[key + ".bias"] = self._get(self.params, path + ("bias",))

    def dense(self, path, key):
        self.sd[key + ".weight"] = np.ascontiguousarray(
            self._get(self.params, path + ("kernel",)).T
        )

    def bn(self, path, key):
        self.sd[key + ".weight"] = self._get(self.params, path + ("scale",))
        self.sd[key + ".bias"] = self._get(self.params, path + ("bias",))
        self.sd[key + ".running_mean"] = self._get(self.stats, path + ("mean",))
        self.sd[key + ".running_var"] = self._get(self.stats, path + ("var",))


def _invert_efficientnet(v: _Inverter, src: tuple[str, ...], dst: str) -> None:
    v.conv(src + ("_conv_stem",), dst + "_conv_stem")
    v.bn(src + ("_bn0",), dst + "_bn0")
    # enumerate flax block submodules under the backbone subtree
    tree = v.params
    for p in src:
        tree = tree[p]
    blocks = sorted(
        int(k.split("_blocks_")[1]) for k in tree if k.startswith("_blocks_")
    )
    for i in blocks:
        bsrc = src + (f"_blocks_{i}",)
        bdst = f"{dst}_blocks.{i}."
        if v.has(bsrc + ("_expand_conv",)):
            v.conv(bsrc + ("_expand_conv",), bdst + "_expand_conv")
            v.bn(bsrc + ("_bn0",), bdst + "_bn0")
        v.conv(bsrc + ("_depthwise_conv",), bdst + "_depthwise_conv")
        v.bn(bsrc + ("_bn1",), bdst + "_bn1")
        if v.has(bsrc + ("_se_reduce",)):
            v.conv(bsrc + ("_se_reduce",), bdst + "_se_reduce", bias=True)
            v.conv(bsrc + ("_se_expand",), bdst + "_se_expand", bias=True)
        v.conv(bsrc + ("_project_conv",), bdst + "_project_conv")
        v.bn(bsrc + ("_bn2",), bdst + "_bn2")


def flax_to_muscle_state_dict(variables: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Exact inverse of :func:`convert_muscle_state_dict` (torch prefix
    'backbone.'): round-trip tested key-by-key in
    tests/test_parity_models.py::test_muscle_converter_inverse_roundtrip."""
    v = _Inverter(variables)
    _invert_efficientnet(v, ("backbone",), "backbone.")
    if v.has(("fuse",)):
        v.conv(("fuse",), "fuse", bias=True)
    if v.has(("fc",)):
        v.dense(("fc",), "fc")
    if v.has(("fuse_dec",)):
        v.conv(("fuse_dec",), "fuse_dec", bias=True)
    if v.has(("BIFPN",)):
        for k in ("inp3", "inp4", "inp5", "inp6", "inp7"):
            v.conv(("BIFPN", k, "conv"), f"BIFPN.{k}.0", bias=True)
            v.bn(("BIFPN", k, "bn"), f"BIFPN.{k}.1")
        layers = sorted(
            int(k.split("layer_")[1])
            for k in v.params["BIFPN"]
            if k.startswith("layer_")
        )
        for i in layers:
            ldst = ("BIFPN", f"layer_{i}")
            lsrc = f"BIFPN.BIFPN_Layers.{i}."
            for k in ("convp67", "convp56", "convp45", "convp34"):
                v.conv(ldst + (k, "conv"), lsrc + k + ".0", bias=True)
            for k in ("out4", "out5", "out6", "out7"):
                v.conv(ldst + (k, "conv"), lsrc + k + ".0", bias=True)
                v.bn(ldst + (k, "bn"), lsrc + k + ".1")
    return v.sd


def _convert_resnet50(t: _Translator, sd: Mapping[str, np.ndarray], src: str, dst: tuple[str, ...]) -> None:
    t.conv(dst + ("conv1",), sd[src + "conv1.weight"])
    t.bn(dst + ("bn1", "bn"), sd, src + "bn1")
    for layer, blocks in (("layer1", 3), ("layer2", 4), ("layer3", 6), ("layer4", 3)):
        for i in range(blocks):
            bsrc = f"{src}{layer}.{i}."
            bdst = dst + (f"{layer}_{i}",)
            for c in ("conv1", "conv2", "conv3"):
                t.conv(bdst + (c,), sd[bsrc + c + ".weight"])
            for b in ("bn1", "bn2", "bn3"):
                t.bn(bdst + (b, "bn"), sd, bsrc + b)
            if bsrc + "downsample.0.weight" in sd:
                t.conv(bdst + ("downsample_conv",), sd[bsrc + "downsample.0.weight"])
                t.bn(bdst + ("downsample_bn", "bn"), sd, bsrc + "downsample.1")


def convert_irn_state_dict(sd: Mapping[str, np.ndarray]) -> dict[str, Any]:
    """Convert an IRN EdgeDisplacement torch state dict to the Flax layout of
    :class:`muscle_tpu.models.EdgeDisplacement` (module root 'net')."""
    t = _Translator()
    _convert_resnet50(t, sd, "resnet50.", ("net", "resnet50"))

    for i in range(1, 6):
        src = f"fc_edge{i}."
        dst = ("net", f"fc_edge{i}")
        t.conv(dst + ("conv",), sd[src + "0.weight"])
        t.gn(dst + ("gn",), sd, src + "1")
    t.conv(("net", "fc_edge6"), sd["fc_edge6.weight"], sd["fc_edge6.bias"])

    for i in range(1, 7):
        src = f"fc_dp{i}."
        dst = ("net", f"fc_dp{i}")
        t.conv(dst + ("conv",), sd[src + "0.weight"])
        t.gn(dst + ("gn",), sd, src + "1")
    t.conv(("net", "fc_dp7_pre", "conv"), sd["fc_dp7.0.weight"])
    t.gn(("net", "fc_dp7_pre", "gn"), sd, "fc_dp7.1")
    t.conv(("net", "fc_dp7_out"), sd["fc_dp7.3.weight"])
    if "mean_shift.running_mean" in sd:
        _set(t.batch_stats, ("net", "mean_shift"), sd["mean_shift.running_mean"])
    return t.variables()
