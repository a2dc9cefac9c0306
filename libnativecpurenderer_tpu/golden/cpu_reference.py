"""Trusted NumPy float64 re-implementation of the reference's semantics.

This is the *test oracle*: a direct, slow, per-pixel translation of
``/root/reference/src/libNativeCPURenderer.cpp`` draw semantics (float64
throughout, identical operation order), used by the golden tests to validate
the jitted TPU executor.  It is intentionally unoptimised and lives outside
the production code path.

The reference has no test suite at all (SURVEY.md §4); this model is how the
TPU build constructs one.
"""

from __future__ import annotations

import math

import numpy as np

from ..core import transform as xf


def _clamp_coord(x: float, size: int) -> float:
    # InterpolateColorFromBuffer clamp (cpp:560-563)
    if x < 0:
        x = 0.0
    if x >= size - 1:
        x = float(size - 2)
    return x


class GoldenTexture:
    def __init__(self, arr: np.ndarray, enable_alpha: bool):
        """arr: (h, w, 3|4) float64."""
        self.buf = np.asarray(arr, np.float64)
        self.height, self.width = self.buf.shape[:2]
        self.enable_alpha = enable_alpha

    def sample(self, x: float, y: float):
        # nearest-neighbour (cpp:555-573); alpha for RGB textures is UB in
        # the reference — the TPU build defines it as 1.0, mirrored here.
        x = _clamp_coord(x, self.width)
        y = _clamp_coord(y, self.height)
        t = self.buf[int(y), int(x)]
        if self.enable_alpha:
            return float(t[0]), float(t[1]), float(t[2]), float(t[3])
        return float(t[0]), float(t[1]), float(t[2]), 1.0

    def resample(self, width: int, height: int) -> "GoldenTexture":
        out = np.zeros((height, width, self.buf.shape[2]), np.float64)
        for j in range(height):
            for i in range(width):
                r, g, b, a = self.sample(i / width * self.width,
                                         j / height * self.height)
                if self.buf.shape[2] == 4:
                    out[j, i] = (r, g, b, a)
                else:
                    out[j, i] = (r, g, b)
        return GoldenTexture(out, self.enable_alpha)


class GoldenContext:
    """Per-pixel float64 mirror of the native RenderContext."""

    @staticmethod
    def _inv_pt(inv, i, j):
        """Inverse-map a pixel center and snap to the 2^-20 subpixel
        grid — the executors snap identically (ops/executor._snap), so
        membership AND shading agree bit-for-bit across executor
        structures despite LLVM-level fma contraction (ROADMAP 'FP
        contraction').  The grid is fine enough that u8 output still
        matches the C++ reference's raw-coordinate shading bit-exactly
        on real scenes (tests/test_cross_engine.py): the divergence
        band is half a cell, 2^-21 px."""
        ix, iy = xf.transform_point(inv, float(i), float(j))
        s = 1048576.0  # 2^20; MUST equal ops/executor.SNAP_SCALE
        return (round(ix * s) / s, round(iy * s) / s)

    def __init__(self, width: int, height: int, enable_alpha: bool):
        self.width = width
        self.height = height
        self.enable_alpha = enable_alpha
        # internal storage always RGBA; channel 3 unused for RGB contexts
        self.buf = np.zeros((height, width, 4), np.float64)
        self.matrix = xf.IDENTITY
        self.color = (1.0, 1.0, 1.0, 1.0)
        self._stack = []

    # -- state ----------------------------------------------------------
    def set_transform(self, *m):
        self.matrix = tuple(m)

    def apply_transform(self, *m):
        self.matrix = xf.compose(self.matrix, *m)

    def scale(self, sx, sy):
        self.matrix = xf.scale(self.matrix, sx, sy)

    def translate(self, tx, ty):
        self.matrix = xf.translate(self.matrix, tx, ty)

    def rotate(self, angle):
        self.matrix = xf.rotate(self.matrix, angle)

    def rotate_degree(self, deg):
        self.rotate(deg * math.pi / 180)

    def save_state(self):
        self._stack.append((self.matrix, self.color))

    def restore_state(self):
        if self._stack:
            self.matrix, self.color = self._stack.pop()

    def set_color_transform(self, r, g, b, a):
        self.color = (r, g, b, a)

    def apply_color_transform(self, r, g, b, a):
        c = self.color
        self.color = (c[0] * r, c[1] * g, c[2] * b, c[3] * a)

    # -- pixel ops (cpp:494-549) -----------------------------------------
    def set_pixel(self, x, y, r, g, b, a):
        x, y = int(x), int(y)
        if x < 0 or x >= self.width or y < 0 or y >= self.height:
            return
        self.buf[y, x, 0] = r
        self.buf[y, x, 1] = g
        self.buf[y, x, 2] = b
        self.buf[y, x, 3] = a  # note: the RGB-mode OOB write (cpp:507-510)
        # is a reference bug not replicated; alpha channel is inert here.

    def apply_pixel(self, x, y, r, g, b, a):
        if x < 0 or x >= self.width or y < 0 or y >= self.height:
            return
        r *= self.color[0]
        g *= self.color[1]
        b *= self.color[2]
        a *= self.color[3]
        if a != 1.0:
            r = self.buf[y, x, 0] * (1 - a) + r * a
            g = self.buf[y, x, 1] * (1 - a) + g * a
            b = self.buf[y, x, 2] * (1 - a) + b * a
        self.buf[y, x, 0] = r
        self.buf[y, x, 1] = g
        self.buf[y, x, 2] = b
        if self.enable_alpha:
            self.buf[y, x, 3] = a

    # -- fills (cpp:643-691) ----------------------------------------------
    def set_color(self, r, g, b, a):
        self.buf[..., 0] = r
        self.buf[..., 1] = g
        self.buf[..., 2] = b
        self.buf[..., 3] = a
        # RGB-mode SetColor corruption (cpp:643-657 + 504-510): off the
        # r==g==b==a std::fill fast path, the column-major SetPixel loop
        # writes each pixel's a into buffer[index+3]; with ipp=3 the
        # last column's writes land in pixel (0, y+1)'s R and survive.
        if (not self.enable_alpha and self.width > 1 and self.height > 1
                and not (r == g and g == b and b == a)):
            self.buf[1:, 0, 0] = a

    def fill_color(self, r, g, b, a):
        for i in range(self.width):
            for j in range(self.height):
                self.apply_pixel(i, j, r, g, b, a)

    # -- primitives ---------------------------------------------------------
    def _aabb(self, x, y, w, h):
        return xf.aabb(self.matrix, x, y, w, h,
                       float(self.width), float(self.height))

    def draw_rect(self, x, y, width, height, r, g, b, a):
        if width <= 0 or height <= 0:
            return
        inv = xf.inverse(self.matrix)
        left, right, top, bottom = self._aabb(x, y, width, height)
        for i in range(left, right):
            for j in range(top, bottom):
                ix, iy = self._inv_pt(inv, i, j)
                if ix < x or ix > x + width or iy < y or iy > y + height:
                    continue
                self.apply_pixel(i, j, r, g, b, a)

    def draw_circle(self, x, y, radius, r, g, b, a):
        if radius <= 0:
            return
        inv = xf.inverse(self.matrix)
        left, right, top, bottom = self._aabb(x - radius, y - radius,
                                              2 * radius, 2 * radius)
        for i in range(left, right):
            for j in range(top, bottom):
                ix, iy = self._inv_pt(inv, i, j)
                if math.sqrt((ix - x) ** 2 + (iy - y) ** 2) > radius:
                    continue
                self.apply_pixel(i, j, r, g, b, a)

    @staticmethod
    def _point_in_polygon(x, y, pts):
        n = len(pts)
        j = n - 1
        res = False
        for i in range(n):
            if ((pts[i][1] > y) != (pts[j][1] > y)) and (
                x < (pts[j][0] - pts[i][0]) * (y - pts[i][1])
                / (pts[j][1] - pts[i][1]) + pts[i][0]
            ):
                res = not res
            j = i
        return res

    def draw_line(self, x1, y1, x2, y2, width, r, g, b, a):
        if width <= 0:
            return
        inv = xf.inverse(self.matrix)
        dx, dy = x2 - x1, y2 - y1
        ln = math.sqrt(dx * dx + dy * dy)
        if ln == 0:
            return
        ux, uy = dx / ln, dy / ln
        vx, vy = -uy, ux
        hw = width / 2
        pts = [
            (x1 - vx * hw, y1 - vy * hw),
            (x1 + vx * hw, y1 + vy * hw),
            (x2 + vx * hw, y2 + vy * hw),
            (x2 - vx * hw, y2 - vy * hw),
        ]
        # full-framebuffer scan (cpp:908-909)
        for i in range(self.width):
            for j in range(self.height):
                ix, iy = self._inv_pt(inv, i, j)
                if not self._point_in_polygon(ix, iy, pts):
                    continue
                self.apply_pixel(i, j, r, g, b, a)

    def draw_vertical_grd(self, x, y, width, height,
                          tr, tg, tb, ta, br_, bg, bb, ba):
        if width <= 0 or height <= 0:
            return
        inv = xf.inverse(self.matrix)
        left, right, top, bottom = self._aabb(x, y, width, height)
        for i in range(left, right):
            for j in range(top, bottom):
                ix, iy = self._inv_pt(inv, i, j)
                if ix < x or ix > x + width or iy < y or iy > y + height:
                    continue
                p = (iy - y) / height
                self.apply_pixel(i, j,
                                 tr + (br_ - tr) * p,
                                 tg + (bg - tg) * p,
                                 tb + (bb - tb) * p,
                                 ta + (ba - ta) * p)

    def draw_texture(self, tex: GoldenTexture, x, y, width, height):
        if width == 0 or height == 0:
            return
        scale_x = tex.width / width
        scale_y = tex.height / height
        if xf.is_no_transform(self.matrix):
            # fast path (cpp:731-752)
            i = int(x)
            while i < x + width:
                j = int(y)
                while j < y + height:
                    u = (i - x) * scale_x
                    v = (j - y) * scale_y
                    r, g, b, a = tex.sample(u, v)
                    self.apply_pixel(i, j, r, g, b, a)
                    j += 1
                i += 1
            return
        inv = xf.inverse(self.matrix)
        left, right, top, bottom = self._aabb(x, y, width, height)
        for i in range(left, right):
            for j in range(top, bottom):
                ix, iy = self._inv_pt(inv, i, j)
                if ix < x or ix > x + width or iy < y or iy > y + height:
                    continue
                u = (ix - x) * scale_x
                v = (iy - y) * scale_y
                r, g, b, a = tex.sample(u, v)
                self.apply_pixel(i, j, r, g, b, a)

    def draw_splitted_texture(self, tex: GoldenTexture, x, y, width, height,
                              u_start, u_end, v_start, v_end):
        if width == 0 or height == 0:
            return
        inv = xf.inverse(self.matrix)
        scale_x = tex.width / width
        scale_y = tex.height / height
        left, right, top, bottom = self._aabb(x, y, width, height)
        for i in range(left, right):
            for j in range(top, bottom):
                ix, iy = self._inv_pt(inv, i, j)
                if ix < x or ix > x + width or iy < y or iy > y + height:
                    continue
                u = (ix - x) * scale_x
                v = (iy - y) * scale_y
                u = (u_start + (u_end - u_start) * u / tex.width) * tex.width
                v = (v_start + (v_end - v_start) * v / tex.height) * tex.height
                r, g, b, a = tex.sample(u, v)
                self.apply_pixel(i, j, r, g, b, a)

    # -- readback (cpp:52-57) ---------------------------------------------
    def uint8_buffer(self) -> np.ndarray:
        ch = 4 if self.enable_alpha else 3
        v = self.buf[..., :ch] * 255.0
        return v.astype(np.int64).astype(np.uint8)

    def float_buffer(self) -> np.ndarray:
        ch = 4 if self.enable_alpha else 3
        return self.buf[..., :ch].copy()


# ---------------------------------------------------------------------------
# hit-effect shader (cpp:1318-1440), scalar float64
# ---------------------------------------------------------------------------
def _fract(x):
    return x - math.floor(x)


def _rand(px, py):
    return _fract(math.sin(px * 12.9898 + py * 78.233) * 43758.5453)


def _noise(px, py):
    ix, iy = math.floor(px), math.floor(py)
    ux, uy = px - ix, py - iy
    a = _rand(ix, iy)
    b = _rand(ix + 1.0, iy)
    c = _rand(ix, iy + 1.0)
    d = _rand(ix + 1.0, iy + 1.0)
    sx = ux * ux * (3.0 - 2.0 * ux)
    sy = uy * uy * (3.0 - 2.0 * uy)
    mab = a + (b - a) * sx
    mcd = c + (d - c) * sx
    return mab + (mcd - mab) * sy


def circular_noise(uvx, uvy, density, seed):
    cx, cy = uvx - 0.5, uvy - 0.5
    radius = math.sqrt(cx * cx + cy * cy) * density
    angle = abs(math.atan2(cy, cx))
    if uvy > 0.5:
        angle += math.sin(angle) * 2.0
    px = radius + seed * 100.0
    py = angle + seed * 100.0
    return (_noise(px, py) * 0.7 + _noise(px * 2.0, py * 2.0) * 0.3
            + _noise(px * 4.0, py * 4.0) * 0.1)


def hit_effect_texture(mask: GoldenTexture, seed, t, r, g, b) -> GoldenTexture:
    """CreateMilthmHitEffectTexture (cpp:1417-1440) including the
    column-major indexing quirk — valid only for square masks, matching all
    reference call sites."""
    assert mask.width == mask.height, "reference call sites are square"
    w = mask.width
    out = np.zeros((w, w, 4), np.float64)
    for i in range(w):           # i indexes width in the reference
        for j in range(w):       # j indexes height
            n = circular_noise(i / w, j / w, 50.0, seed)
            a = 0.0 if n < t else 1.0
            mask_a = mask.buf[i, j, 3]  # GetPixelChannel's transposed read
            # column-major store: buffer[i*H*4 + j*4] == row-major (y=i, x=j)
            out[i, j] = (r, g, b, a * mask_a)
    return GoldenTexture(out, True)
