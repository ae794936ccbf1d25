"""Cross-mode consistency on the PLANAR kiosk panel (VERDICT r2 weak #6a):
window vs full-frame disagreement should collapse vs the 10.3 px seen on
the non-planar default quad."""
import sys
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import os

import jax
if os.environ.get("WOFT_CPU"):        # deterministic CPU run (no tunnel)
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import numpy as np
from pathlib import Path
import cv2

from woft_tpu.config import load_config

SEQ = Path("/root/reference/demo/V24_7")
BBOX = (430, 215, 310, 490)
N = 40

paths = sorted(SEQ.glob("*.jpg"))[:N]
frames = [cv2.imread(str(p)) for p in paths]
mask = np.zeros(frames[0].shape[:2], np.uint8)
x, y, w, h = BBOX
mask[y:y+h, x:x+w] = 1

def run(cfg_name):
    conf = load_config(f"/root/repo/woft_tpu/configs/{cfg_name}")
    conf.downscale_inputs = 2
    tr = conf.tracker_class(conf)
    tr.init(frames[0], mask)
    hs = []
    for f in frames[1:]:
        H, meta = tr.track(f)
        hs.append(np.asarray(H, np.float64))
    return hs

hs_full = run("WOFT.py")
print("full-frame done", flush=True)
hs_win = run("WOFT_window.py")
print("window done", flush=True)

corners = np.array([[x, y], [x+w, y], [x+w, y+h], [x, y+h]], np.float64)
pts = np.concatenate([corners, np.ones((4, 1))], 1).T
errs = []
for Hf, Hw in zip(hs_full, hs_win):
    pf = np.linalg.inv(Hf) @ pts; pf = pf[:2] / pf[2]
    pw = np.linalg.inv(Hw) @ pts; pw = pw[:2] / pw[2]
    errs.append(float(np.mean(np.linalg.norm(pf - pw, axis=0))))
errs = np.array(errs)
print(f"window-vs-full on PLANAR panel ({len(errs)} frames): "
      f"median {np.median(errs):.3f} px  mean {errs.mean():.3f}  "
      f"max {errs.max():.3f}")
