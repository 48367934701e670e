import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from muscle_tpu.utils.compile_cache import enable
enable()
from PIL import Image
from muscle_tpu.inference import SegTTAEngine
from muscle_tpu.models import MuSCLe

rng = np.random.default_rng(0)
model = MuSCLe(backbone_name="efficientnet-b7", mode="dec", bifpn_layers=3,
               last_pooling=True, dtype=jnp.bfloat16)
variables = jax.jit(
    lambda k: model.init({"params": k}, jnp.zeros((1, 64, 64, 3)), mode="seg")
)(jax.random.key(0))
eng = SegTTAEngine(model, variables, compute_dtype=jnp.bfloat16,
                   accum_stride=4, download_dtype="float16",
                   tight_upload=True, upload_mode="ycbcr420")
B = 4
def batch(i):
    imgs = [Image.fromarray(rng.integers(0, 255, (375, 500, 3), np.uint8)) for _ in range(B)]
    return imgs, [f"s{i}_{j}" for j in range(B)]

t0 = time.time()
eng.run_batch(*batch(0))
print(f"compile+first batch: {time.time()-t0:.0f}s", flush=True)
import collections
rates = []
for wnd in range(3):
    t0 = time.time(); n = 0
    pending = collections.deque()
    for i in range(4):
        pending.append(eng.run_batch_async(*batch(10 + wnd*4 + i)))
        if len(pending) > 1:
            n += len(pending.popleft()())
    while pending:
        n += len(pending.popleft()())
    rates.append(n / (time.time() - t0))
print(f"seg TTA b7 12-version: {float(np.median(rates)):.2f} img/s/chip (median of 3 windows)")
