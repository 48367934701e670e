"""Import the read-only PyTorch reference (/root/reference) for parity tests.

The reference targets python 3.6 / torchvision / cv2 / qpth / scipy.misc,
several of which are absent here; we stub just enough for *import* to
succeed (none of the stubbed functionality is exercised by the forward
passes we compare against).  Nothing from the reference is copied — it is
imported in-place purely as a test oracle.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def load_reference():
    """Make `src` (the reference package) importable and patched for offline
    use.  Returns the imported `src` package."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    # --- stubs for unavailable third-party deps (import-time only) ---
    cv2 = _stub("cv2", EMD=None, DIST_USER=None, resize=None, INTER_NEAREST=0)
    qpth = _stub("qpth")
    qp = _stub("qpth.qp", QPFunction=lambda *a, **k: None)
    qpth.qp = qp
    tv = _stub("torchvision")
    transforms = _stub("torchvision.transforms")
    tv.transforms = transforms

    class _NoOpTransform:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    transforms.ColorJitter = _NoOpTransform
    transforms.Compose = _NoOpTransform
    transforms.RandomErasing = _NoOpTransform
    tfunc = _stub("torchvision.transforms.functional")
    transforms.functional = tfunc
    import scipy

    if not hasattr(scipy, "misc"):
        _stub("scipy.misc")
        scipy.misc = sys.modules["scipy.misc"]
    _stub("skimage")
    _stub("skimage.transform", resize=None)
    sys.modules["skimage"].transform = sys.modules["skimage.transform"]

    # Block the pretrained-weight download path (zero egress).
    import src.efficientnet_pytorch.model as ref_model
    import src.efficientnet_pytorch.utils as ref_utils

    noop = lambda *a, **k: None  # noqa: E731
    ref_model.load_pretrained_weights = noop
    ref_utils.load_pretrained_weights = noop

    import src

    return src
