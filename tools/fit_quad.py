import sys
import cv2
import numpy as np

path = sys.argv[1]
sx, sy = int(sys.argv[2]), int(sys.argv[3])
x0, y0, x1, y1 = (int(v) for v in sys.argv[4:8])
thr = float(sys.argv[8]) if len(sys.argv) > 8 else 30
im = cv2.imread(path)
roi = im[y0:y1, x0:x1]
lab = cv2.cvtColor(roi, cv2.COLOR_BGR2LAB).astype(np.float32)
ref = np.median(lab[sy - y0 - 6:sy - y0 + 6, sx - x0 - 6:sx - x0 + 6].reshape(-1, 3), 0)
d = np.linalg.norm(lab - ref, axis=2)
mask = (d < thr).astype(np.uint8)
mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, np.ones((9, 9), np.uint8))
mask = cv2.morphologyEx(mask, cv2.MORPH_OPEN, np.ones((5, 5), np.uint8))
n, lbl, stats, cent = cv2.connectedComponentsWithStats(mask)
comp = lbl[sy - y0, sx - x0]
if comp == 0:
    print("seed not in mask"); sys.exit(1)
m = (lbl == comp).astype(np.uint8)
cnts, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
c = max(cnts, key=cv2.contourArea)
peri = cv2.arcLength(c, True)
ap = None
for eps in (0.01, 0.02, 0.03, 0.05, 0.08):
    ap = cv2.approxPolyDP(c, eps * peri, True)
    if len(ap) == 4:
        break
pts = (ap.reshape(-1, 2) + [x0, y0]).tolist()
print("poly pts:", pts, "area", cv2.contourArea(c))
vis = im.copy()
cv2.drawContours(vis, [c + [x0, y0]], -1, (0, 0, 255), 1)
for p in pts:
    cv2.circle(vis, tuple(p), 4, (0, 255, 255), -1)
cv2.imwrite("/tmp/fit_quad_vis.png", vis)
