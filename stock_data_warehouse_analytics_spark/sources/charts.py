"""Chart PNG sinks (SURVEY.md §2.1 S8) — pure stdlib + numpy, no
matplotlib (absent in this environment): a PNG encoder (zlib + struct,
~15 lines — PNG is length-prefixed chunks over a zlib stream), a small
raster canvas (numpy RGB buffer, sampled-line drawing, 5×7 bitmap
font), and the line/bar chart builders the reference's visualization
layer produces (olap_analysis.py:80-184, datavisualization.py:164-535;
same default-matplotlib 'tab10' palette).

Scale stance: charts render DRIVER-SIDE from collected REPORT tables —
chart inputs are aggregates (per-quarter, per-month, per-ticker), i.e.
bounded by the report grain, never raw facts; this mirrors the
reference, where matplotlib also renders from the pivoted result
tables.  The engine contract remains the result tables; these sinks
close the S8 line item with real, dependency-free PNGs (round-tripped
through the in-repo PPM decoder in tests/test_charts.py)."""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "encode_png",
    "Canvas",
    "line_chart",
    "bar_chart",
    "heatmap",
    "scatter_chart",
    "box_plot",
]

# matplotlib default categorical palette (public 'tab10' values)
PALETTE = [
    (31, 119, 180), (255, 127, 14), (44, 160, 44), (214, 39, 40),
    (148, 103, 189), (140, 86, 75), (227, 119, 194), (127, 127, 127),
]
WHITE, BLACK, GREY = (255, 255, 255), (0, 0, 0), (210, 210, 210)

# 5×7 bitmap font: 7 rows of 5 bits per glyph (uppercase + digits +
# the punctuation chart labels need)
_F = {
    "0": (0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    "1": (0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "2": (0x0E, 0x11, 0x01, 0x02, 0x04, 0x08, 0x1F),
    "3": (0x1F, 0x02, 0x04, 0x02, 0x01, 0x11, 0x0E),
    "4": (0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    "5": (0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    "6": (0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    "7": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    "8": (0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    "9": (0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C),
    "A": (0x0E, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "B": (0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E),
    "C": (0x0E, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0E),
    "D": (0x1C, 0x12, 0x11, 0x11, 0x11, 0x12, 0x1C),
    "E": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F),
    "F": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x10),
    "G": (0x0E, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0F),
    "H": (0x11, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "I": (0x0E, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "J": (0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0C),
    "K": (0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    "L": (0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1F),
    "M": (0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11),
    "N": (0x11, 0x19, 0x15, 0x13, 0x11, 0x11, 0x11),
    "O": (0x0E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "P": (0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10),
    "Q": (0x0E, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0D),
    "R": (0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11),
    "S": (0x0F, 0x10, 0x10, 0x0E, 0x01, 0x01, 0x1E),
    "T": (0x1F, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    "U": (0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "V": (0x11, 0x11, 0x11, 0x11, 0x11, 0x0A, 0x04),
    "W": (0x11, 0x11, 0x11, 0x15, 0x15, 0x1B, 0x11),
    "X": (0x11, 0x11, 0x0A, 0x04, 0x0A, 0x11, 0x11),
    "Y": (0x11, 0x11, 0x0A, 0x04, 0x04, 0x04, 0x04),
    "Z": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1F),
    ".": (0x00, 0x00, 0x00, 0x00, 0x00, 0x0C, 0x0C),
    ",": (0x00, 0x00, 0x00, 0x00, 0x0C, 0x04, 0x08),
    "-": (0x00, 0x00, 0x00, 0x1F, 0x00, 0x00, 0x00),
    "/": (0x01, 0x02, 0x02, 0x04, 0x08, 0x08, 0x10),
    "%": (0x19, 0x1A, 0x02, 0x04, 0x08, 0x0B, 0x13),
    ":": (0x00, 0x0C, 0x0C, 0x00, 0x0C, 0x0C, 0x00),
    "(": (0x02, 0x04, 0x08, 0x08, 0x08, 0x04, 0x02),
    ")": (0x08, 0x04, 0x02, 0x02, 0x02, 0x04, 0x08),
    " ": (0, 0, 0, 0, 0, 0, 0),
}


def encode_png(rgb: np.ndarray) -> bytes:
    """RGB uint8 (h, w, 3) → PNG bytes (8-bit truecolor, filter 0)."""
    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))

    def chunk(typ: bytes, data: bytes) -> bytes:
        body = typ + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


class Canvas:
    """Minimal deterministic raster canvas: numpy RGB buffer with
    sampled-segment lines, rects, and the 5×7 bitmap font."""

    def __init__(self, w: int, h: int, bg=WHITE):
        self.w, self.h = w, h
        self.px = np.full((h, w, 3), bg, dtype=np.uint8)

    def set(self, x: int, y: int, color) -> None:
        if 0 <= x < self.w and 0 <= y < self.h:
            self.px[y, x] = color

    def line(self, x0, y0, x1, y1, color, width: int = 1) -> None:
        n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
        xs = np.linspace(x0, x1, n).round().astype(int)
        ys = np.linspace(y0, y1, n).round().astype(int)
        for dx in range(width):
            for dy in range(width):
                for x, y in zip(xs + dx, ys + dy):
                    self.set(int(x), int(y), color)

    def rect(self, x0, y0, x1, y1, color, fill: bool = True) -> None:
        x0, x1 = sorted((int(x0), int(x1)))
        y0, y1 = sorted((int(y0), int(y1)))
        x0c, x1c = max(x0, 0), min(x1, self.w - 1)
        y0c, y1c = max(y0, 0), min(y1, self.h - 1)
        if x0c > x1c or y0c > y1c:
            return
        if fill:
            self.px[y0c : y1c + 1, x0c : x1c + 1] = color
        else:
            self.line(x0, y0, x1, y0, color)
            self.line(x0, y1, x1, y1, color)
            self.line(x0, y0, x0, y1, color)
            self.line(x1, y0, x1, y1, color)

    def text(self, x: int, y: int, s: str, color=BLACK, scale: int = 1) -> None:
        cx = x
        for ch in str(s).upper():
            glyph = _F.get(ch, _F[" "])
            for ry, row in enumerate(glyph):
                for rx in range(5):
                    if row & (1 << (4 - rx)):
                        if scale == 1:
                            self.set(cx + rx, y + ry, color)
                        else:
                            self.rect(
                                cx + rx * scale,
                                y + ry * scale,
                                cx + rx * scale + scale - 1,
                                y + ry * scale + scale - 1,
                                color,
                            )
            cx += 6 * scale

    def png(self) -> bytes:
        return encode_png(self.px)

    def ppm(self) -> bytes:
        """Binary P6 — decodable by operators.multimodal.decode_image,
        which is how tests round-trip the rendering."""
        header = f"P6\n{self.w} {self.h}\n255\n".encode()
        return header + self.px.tobytes()


def _fmt(v: float) -> str:
    a = abs(v)
    if a >= 1e9:
        return f"{v / 1e9:.1f}B"
    if a >= 1e6:
        return f"{v / 1e6:.1f}M"
    if a >= 1e3:
        return f"{v / 1e3:.1f}K"
    if a >= 10 or v == int(v):
        return f"{v:.0f}"
    return f"{v:.2f}"


_MARGIN_L, _MARGIN_R, _MARGIN_T, _MARGIN_B = 70, 20, 40, 30


def _frame(c: Canvas, title: str, lo_x, hi_x, lo_y, hi_y, x_fmt=None):
    """Axes box, 5 ticks per axis with labels, title.  Returns the
    data→pixel transform."""
    px0, px1 = _MARGIN_L, c.w - _MARGIN_R
    py0, py1 = c.h - _MARGIN_B, _MARGIN_T  # y grows up
    sx = (px1 - px0) / ((hi_x - lo_x) or 1.0)
    sy = (py0 - py1) / ((hi_y - lo_y) or 1.0)

    def to_px(x, y):
        return (
            int(round(px0 + (x - lo_x) * sx)),
            int(round(py0 - (y - lo_y) * sy)),
        )

    c.rect(px0, py1, px1, py0, BLACK, fill=False)
    for i in range(5):
        fy = lo_y + (hi_y - lo_y) * i / 4
        _, py = to_px(lo_x, fy)
        c.line(px0 + 1, py, px1 - 1, py, GREY)
        c.text(4, py - 3, _fmt(fy))
        fx = lo_x + (hi_x - lo_x) * i / 4
        px, _ = to_px(fx, lo_y)
        label = x_fmt(fx) if x_fmt else _fmt(fx)
        c.text(px - 3 * len(str(label)), c.h - _MARGIN_B + 6, label)
    c.text(_MARGIN_L, 12, title, scale=2)
    return to_px


def line_chart(
    series: list[tuple[str, list[tuple[float, float]]]],
    *,
    title: str = "",
    w: int = 960,
    h: int = 480,
    x_fmt=None,
) -> Canvas:
    """Multi-series line chart with legend; series are
    (label, [(x, y), …]) with numeric x (dates pre-converted)."""
    c = Canvas(w, h)
    pts = [p for _, ps in series for p in ps]
    if not pts:
        return c
    lo_x, hi_x = min(p[0] for p in pts), max(p[0] for p in pts)
    lo_y, hi_y = min(p[1] for p in pts), max(p[1] for p in pts)
    pad = (hi_y - lo_y) * 0.05 or 1.0
    to_px = _frame(c, title, lo_x, hi_x, lo_y - pad, hi_y + pad, x_fmt)
    for i, (label, ps) in enumerate(series):
        color = PALETTE[i % len(PALETTE)]
        pix = [to_px(x, y) for x, y in sorted(ps)]
        for (x0, y0), (x1, y1) in zip(pix, pix[1:]):
            c.line(x0, y0, x1, y1, color, width=2)
        ly = _MARGIN_T + 4 + 12 * i
        c.rect(w - _MARGIN_R - 110, ly, w - _MARGIN_R - 98, ly + 8, color)
        c.text(w - _MARGIN_R - 92, ly, label)
    return c


def bar_chart(
    labels: list[str],
    values: list[float],
    *,
    title: str = "",
    w: int = 960,
    h: int = 480,
    color=PALETTE[0],
) -> Canvas:
    """Single-series bar chart with per-bar x labels."""
    c = Canvas(w, h)
    if not values:
        return c
    lo_y = min(0.0, min(values))
    hi_y = max(values) or 1.0
    to_px = _frame(c, title, -0.5, len(values) - 0.5, lo_y, hi_y * 1.05)
    x0_axis, y_base = to_px(-0.5, lo_y)
    for i, (lab, v) in enumerate(zip(labels, values)):
        xl, yt = to_px(i - 0.35, v)
        xr, _ = to_px(i + 0.35, v)
        c.rect(xl, yt, xr, y_base - 1, color)
        c.text((xl + xr) // 2 - 3 * len(str(lab)), c.h - _MARGIN_B + 6, lab)
    return c


# --- colormaps (public anchor values, linearly interpolated) ---------
# RdYlGn / coolwarm / viridis endpoints+midpoints as published by
# matplotlib's docs; 3-5 anchors are enough for chart-grade rendering.
_CMAPS = {
    "rdylgn": [(165, 0, 38), (255, 255, 191), (0, 104, 55)],
    "coolwarm": [(59, 76, 192), (221, 221, 221), (180, 4, 38)],
    "viridis": [
        (68, 1, 84), (59, 82, 139), (33, 145, 140), (94, 201, 98),
        (253, 231, 37),
    ],
}


def _cmap_color(name: str, t: float) -> tuple[int, int, int]:
    anchors = _CMAPS[name]
    t = min(max(t, 0.0), 1.0)
    pos = t * (len(anchors) - 1)
    i = min(int(pos), len(anchors) - 2)
    frac = pos - i
    a, b = anchors[i], anchors[i + 1]
    return tuple(int(round(a[k] + (b[k] - a[k]) * frac)) for k in range(3))


def heatmap(
    row_labels: list[str],
    col_labels: list[str],
    values: "list[list[float | None]]",
    *,
    title: str = "",
    cmap: str = "rdylgn",
    annot: bool = True,
    w: int = 960,
    h: int = 480,
) -> Canvas:
    """Annotated matrix heatmap — the reference's quarterly-price and
    correlation/covariance heatmaps (olap_analysis.py:179-184,
    datavisualization.py:254,699,714; sns.heatmap with RdYlGn /
    coolwarm / viridis).  Cells colored by min-max-normalized value
    through the interpolated colormap; None cells render grey.  Input
    is a REPORT-grain pivot (rows × cols bounded by the report), never
    raw facts."""
    c = Canvas(w, h)
    nr, nc = len(row_labels), len(col_labels)
    if not nr or not nc:
        return c
    flat = [v for row in values for v in row if v is not None]
    lo, hi = (min(flat), max(flat)) if flat else (0.0, 1.0)
    rng = (hi - lo) or 1.0
    px0, px1 = _MARGIN_L, w - _MARGIN_R
    py0, py1 = _MARGIN_T, h - _MARGIN_B
    cw, ch = (px1 - px0) / nc, (py1 - py0) / nr
    for ri, row in enumerate(values):
        for ci, v in enumerate(row):
            x0 = int(px0 + ci * cw)
            y0 = int(py0 + ri * ch)
            x1 = int(px0 + (ci + 1) * cw) - 2
            y1 = int(py0 + (ri + 1) * ch) - 2
            color = (
                GREY if v is None else _cmap_color(cmap, (v - lo) / rng)
            )
            c.rect(x0, y0, x1, y1, color)
            if annot and v is not None and cw >= 40 and ch >= 12:
                s = _fmt(v)
                # dark annot on light cells, light on dark
                lum = 0.299 * color[0] + 0.587 * color[1] + 0.114 * color[2]
                c.text(
                    (x0 + x1) // 2 - 3 * len(s),
                    (y0 + y1) // 2 - 3,
                    s,
                    BLACK if lum > 140 else WHITE,
                )
    for ri, lab in enumerate(row_labels):
        c.text(4, int(py0 + (ri + 0.5) * ch) - 3, str(lab))
    for ci, lab in enumerate(col_labels):
        c.text(
            int(px0 + (ci + 0.5) * cw) - 3 * len(str(lab)),
            h - _MARGIN_B + 6,
            str(lab),
        )
    c.text(_MARGIN_L, 12, title, scale=2)
    return c


def scatter_chart(
    series: list[tuple[str, list[tuple[float, float]]]],
    *,
    title: str = "",
    w: int = 960,
    h: int = 480,
    x_fmt=None,
    marker: int = 2,
) -> Canvas:
    """Multi-series scatter with legend — the reference's spike-vs-
    return scatters (datavisualization.py:652,770; px.scatter /
    sns.scatterplot).  Same frame/legend conventions as line_chart;
    each point is a (2·marker+1)-px square."""
    c = Canvas(w, h)
    pts = [p for _, ps in series for p in ps]
    if not pts:
        return c
    lo_x, hi_x = min(p[0] for p in pts), max(p[0] for p in pts)
    lo_y, hi_y = min(p[1] for p in pts), max(p[1] for p in pts)
    pad = (hi_y - lo_y) * 0.05 or 1.0
    to_px = _frame(c, title, lo_x, hi_x, lo_y - pad, hi_y + pad, x_fmt)
    for i, (label, ps) in enumerate(series):
        color = PALETTE[i % len(PALETTE)]
        for x, y in ps:
            px, py = to_px(x, y)
            c.rect(px - marker, py - marker, px + marker, py + marker, color)
        ly = _MARGIN_T + 4 + 12 * i
        c.rect(w - _MARGIN_R - 110, ly, w - _MARGIN_R - 98, ly + 8, color)
        c.text(w - _MARGIN_R - 92, ly, label)
    return c


def box_plot(
    labels: list[str],
    stats: "list[tuple[float, float, float, float, float]]",
    *,
    title: str = "",
    w: int = 960,
    h: int = 480,
) -> Canvas:
    """Five-number-summary box plot — the reference's per-ticker risk
    boxplot (datavisualization.py:378-389; sns.boxplot).  ``stats``
    per label is (lo_whisker, q1, median, q3, hi_whisker) — computed
    ENGINE-SIDE (grouped percentiles in Spark), so only the bounded
    per-group summary reaches the driver; matplotlib instead ships the
    raw column, which is exactly what does not scale."""
    c = Canvas(w, h)
    if not stats:
        return c
    lo_y = min(s[0] for s in stats)
    hi_y = max(s[4] for s in stats)
    pad = (hi_y - lo_y) * 0.05 or 1.0
    to_px = _frame(
        c, title, -0.5, len(stats) - 0.5, lo_y - pad, hi_y + pad
    )
    for i, (lab, (wlo, q1, med, q3, whi)) in enumerate(zip(labels, stats)):
        color = PALETTE[i % len(PALETTE)]
        xc, _ = to_px(i, 0)
        xl, yq3 = to_px(i - 0.3, q3)
        xr, yq1 = to_px(i + 0.3, q1)
        _, ymed = to_px(i, med)
        _, ylo = to_px(i, wlo)
        _, yhi = to_px(i, whi)
        c.line(xc, yhi, xc, yq3, BLACK)  # upper whisker
        c.line(xc, yq1, xc, ylo, BLACK)  # lower whisker
        c.line(xl, yhi, xr, yhi, BLACK)
        c.line(xl, ylo, xr, ylo, BLACK)
        c.rect(xl, yq3, xr, yq1, color)
        c.rect(xl, yq3, xr, yq1, BLACK, fill=False)
        c.line(xl, ymed, xr, ymed, BLACK, width=2)
        c.text(xc - 3 * len(str(lab)), c.h - _MARGIN_B + 6, str(lab))
    return c
