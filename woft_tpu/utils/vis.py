"""Visualization helpers (host side, cv2/numpy).

Covers the reference surfaces the demo and debug paths use
(ref:pytracking/utils/vis_utils.py): mask contour blending, colormaps,
magenta/green alignment blends, flow-arrow rendering, Middlebury flow
colouring, and simple grid tiling.
"""

import numpy as np


def blend_mask(img, mask, color=(0, 255, 0), alpha=0.5, fill=True,
               contour_thickness=None):
    """Blend a binary mask into an image; optionally only its contour
    (ref:vis_utils.py:593-621)."""
    import cv2
    out = img.copy()
    binary = np.uint8(mask > 0)
    if fill:
        overlay = out.copy()
        overlay[binary > 0] = color
        out = cv2.addWeighted(overlay, alpha, out, 1 - alpha, 0)
    if contour_thickness is not None:
        contours, _ = cv2.findContours(binary, cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_NONE)
        cv2.drawContours(out, contours, -1, color, contour_thickness)
    return out


def cv2_colormap(values, vmin=None, vmax=None, colormap=None):
    """Map scalars to BGR colors (ref:vis_utils.py:177-197)."""
    import cv2
    colormap = cv2.COLORMAP_VIRIDIS if colormap is None else colormap
    v = np.asarray(values, np.float32)
    vmin = np.nanmin(v) if vmin is None else vmin
    vmax = np.nanmax(v) if vmax is None else vmax
    scaled = np.clip((v - vmin) / max(vmax - vmin, 1e-12), 0, 1)
    return cv2.applyColorMap(np.uint8(255 * scaled), colormap)


def vis_alignment_plain(img_a, img_b):
    """Magenta/green alignment blend (ref:vis_utils.py:214-234)."""
    import cv2
    a = cv2.cvtColor(img_a, cv2.COLOR_BGR2GRAY)
    b = cv2.cvtColor(img_b, cv2.COLOR_BGR2GRAY)
    return np.dstack([b, a, b])     # BGR: a -> green, b -> magenta


def draw_text(img, text, pos="tl", size=1.0, thickness=2,
              color=(255, 255, 255)):
    import cv2
    h = img.shape[0]
    xy = {"tl": (10, 30), "bl": (10, h - 10)}[pos]
    cv2.putText(img, text, xy, cv2.FONT_HERSHEY_SIMPLEX, size, (0, 0, 0),
                thickness + 2)
    cv2.putText(img, text, xy, cv2.FONT_HERSHEY_SIMPLEX, size, color,
                thickness)
    return img


def vis_flow_arrows(flow, canvas, grid_sz=20, color=(0, 255, 0),
                    weights=None):
    """Sparse flow arrows on a canvas, optionally weight-coloured
    (ref:vis_utils.py:702-928, simplified)."""
    import cv2
    H, W = flow.shape[:2]
    out = canvas.copy()
    for y in range(grid_sz // 2, H, grid_sz):
        for x in range(grid_sz // 2, W, grid_sz):
            dx, dy = flow[y, x]
            if weights is not None:
                w = float(np.clip(weights[y, x], 0, 1))
                c = (int(255 * (1 - w)), int(255 * w), 0)
            else:
                c = color
            cv2.arrowedLine(out, (x, y), (int(x + dx), int(y + dy)), c, 1,
                            tipLength=0.3)
    return out


def baker_colorwheel():
    """The 55-entry Middlebury/Baker optical-flow colour wheel.

    Same table as Scharstein's original evaluation code
    (ref:raft_core/utils/flow_viz.py:20-68; Baker et al., ICCV 2007),
    built here from the six hue segments as (start RGB, ramp channel, sign):
    within each segment one channel ramps linearly by floor(255*i/len)."""
    # (length, base RGB, ramping channel, direction)
    segments = [(15, (255, 0, 0), 1, +1),     # R -> Y
                (6, (255, 255, 0), 0, -1),    # Y -> G
                (4, (0, 255, 0), 2, +1),      # G -> C
                (11, (0, 255, 255), 1, -1),   # C -> B
                (13, (0, 0, 255), 0, +1),     # B -> M
                (6, (255, 0, 255), 2, -1)]    # M -> R
    rows = []
    for length, base, ch, sign in segments:
        seg = np.tile(np.asarray(base, np.float64), (length, 1))
        ramp = np.floor(255.0 * np.arange(length) / length)
        seg[:, ch] = base[ch] + sign * ramp
        rows.append(seg)
    return np.concatenate(rows)                           # (55, 3)


def flow_to_image(flow, clip_flow=None, convert_to_bgr=False):
    """Baker flow colouring, exact twin of the reference
    (ref:raft_core/utils/flow_viz.py:71-131): angle interpolates the
    55-colour wheel, radius (normalised to the frame max) desaturates
    toward white, out-of-range radii darken to 75%."""
    u = flow[..., 0].astype(np.float64)
    v = flow[..., 1].astype(np.float64)
    if clip_flow is not None:
        u = np.clip(u, 0, clip_flow)
        v = np.clip(v, 0, clip_flow)
    rad = np.sqrt(u ** 2 + v ** 2)
    rad = rad / (np.max(rad) + 1e-5)

    wheel = baker_colorwheel() / 255.0                    # (55, 3)
    ncols = wheel.shape[0]
    fk = (np.arctan2(-v, -u) / np.pi + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(np.int32)
    f = (fk - k0)[..., None]
    col = (1 - f) * wheel[k0] + f * wheel[(k0 + 1) % ncols]
    col = np.where(rad[..., None] <= 1,
                   1 - rad[..., None] * (1 - col), 0.75 * col)
    img = np.floor(255 * col).astype(np.uint8)
    return img[..., ::-1] if convert_to_bgr else img


def vis_flow_align(flow, img_a, img_b, grid_sz=20, arrow_color=None,
                   pt_radius=2, show_flow=True, weights=None):
    """Side-by-side correspondence visualisation: img_a | img_b with each
    grid point linked to its flow target, per-point coloured
    (ref:vis_utils.py:831-928 — the tracker's debug renderer).

    Args:
        flow: (H, W, 2) flow img_a -> img_b.
        arrow_color: optional (H*W, 3|4) per-pixel BGR(A) colors; alpha 0
            (4th channel) skips a point — the reference masks TCs this way.
        weights: optional (H, W) reliabilities -> red-to-green coloring
            when ``arrow_color`` is not given.
    """
    import cv2
    H, W = flow.shape[:2]
    canvas = np.hstack([img_a, img_b]).astype(np.uint8).copy()
    for y in range(grid_sz // 2, H, grid_sz):
        for x in range(grid_sz // 2, W, grid_sz):
            if arrow_color is not None:
                c = arrow_color[y * W + x]
                if len(c) > 3 and c[3] == 0:
                    continue
                color = tuple(int(v) for v in c[:3])
            elif weights is not None:
                w = float(np.clip(weights[y, x], 0, 1))
                color = (int(255 * (1 - w)), int(255 * w), 0)
            else:
                color = (0, 255, 0)
            dx, dy = flow[y, x]
            tx, ty = int(round(x + dx)) + W, int(round(y + dy))
            cv2.circle(canvas, (x, y), pt_radius, color, -1)
            if 0 <= ty < H and W <= tx < 2 * W:
                cv2.circle(canvas, (tx, ty), pt_radius, color, -1)
                if show_flow:
                    cv2.line(canvas, (x, y), (tx, ty), color, 1)
    return canvas


def name_fig(images, names):
    """Stamp a name onto each image (ref:vis_utils.py:434-504)."""
    out = []
    for im, name in zip(images, names):
        im = im.copy()
        if im.ndim == 2:
            im = np.dstack([im] * 3)
        out.append(draw_text(im, name))
    return out


def tile(image):
    """Identity hook kept for reference-API shape (the reference's tile
    resizes grid cells; griddify already emits one canvas)."""
    return image


def checkerboard(h, w, sq=8):
    """(ref:vis_utils.py:931-941)."""
    ys, xs = np.mgrid[0:h, 0:w]
    return np.uint8(255 * (((ys // sq) + (xs // sq)) % 2))


def griddify(images, cols):
    """Tile images into a grid (ref:vis_utils.py:434-504, simplified)."""
    import math
    rows = math.ceil(len(images) / cols)
    h = max(im.shape[0] for im in images)
    w = max(im.shape[1] for im in images)
    canvas = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, im in enumerate(images):
        r, c = divmod(i, cols)
        canvas[r * h:r * h + im.shape[0], c * w:c * w + im.shape[1]] = im
    return canvas
