"""Chart-sink (S8) tests: the pure-stdlib PNG renderer round-tripped
through the repo's own PPM decoder, plus the pipeline chart stage."""

from __future__ import annotations

import struct
import zlib


def _png_dims(png: bytes) -> tuple[int, int]:
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert png[12:16] == b"IHDR"
    w, h = struct.unpack(">II", png[16:24])
    assert b"IEND" in png[-12:]
    return w, h


def _png_pixels(png: bytes):
    """Minimal PNG reader for our own encoder's output (filter 0,
    8-bit RGB): concatenate IDAT, inflate, strip filter bytes."""
    import numpy as np

    w, h = _png_dims(png)
    pos, idat = 8, b""
    while pos < len(png):
        (ln,) = struct.unpack(">I", png[pos : pos + 4])
        typ = png[pos + 4 : pos + 8]
        if typ == b"IDAT":
            idat += png[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(idat)
    rows = []
    stride = w * 3 + 1
    for y in range(h):
        row = raw[y * stride : (y + 1) * stride]
        assert row[0] == 0  # filter 0 only
        rows.append(np.frombuffer(row[1:], dtype=np.uint8).reshape(w, 3))
    return np.stack(rows)


def test_line_chart_png_structure_and_colors():
    from stock_data_warehouse_analytics_spark.sources.charts import (
        PALETTE,
        line_chart,
    )

    series = [
        ("AAA", [(float(i), float(i * i % 17)) for i in range(30)]),
        ("BBB", [(float(i), float((i * 7) % 23)) for i in range(30)]),
    ]
    c = line_chart(series, title="TEST CHART 123", w=400, h=240)
    png = c.png()
    assert _png_dims(png) == (400, 240)
    # deterministic: a second render is byte-identical
    assert line_chart(series, title="TEST CHART 123", w=400, h=240).png() == png

    px = _png_pixels(png)
    flat = {tuple(p) for row in px for p in row}
    assert tuple(PALETTE[0]) in flat, "series-0 color missing"
    assert tuple(PALETTE[1]) in flat, "series-1 color missing"
    assert (0, 0, 0) in flat, "axes/title pixels missing"
    # mostly background
    white = (px == 255).all(axis=2).mean()
    assert white > 0.5


def test_chart_roundtrip_through_own_ppm_decoder(spark):
    """The canvas's P6 output must decode through the repo's real image
    decoder with matching dimensions and exact channel sums."""
    import numpy as np

    from stock_data_warehouse_analytics_spark.operators.multimodal import (
        decode_image,
    )
    from stock_data_warehouse_analytics_spark.sources.charts import bar_chart

    c = bar_chart(["Q1", "Q2", "Q3"], [3.0, 1.0, 2.0], title="BARS", w=200, h=120)
    blob = c.ppm()
    row = (
        decode_image(
            spark.createDataFrame([(1, bytearray(blob))], "doc_id long, payload binary")
        )
        .collect()[0]
    )
    assert (row.width, row.height) == (200, 120)
    sums = c.px.astype(np.int64).reshape(-1, 3).sum(axis=0)
    assert (row.sum_r, row.sum_g, row.sum_b) == tuple(int(s) for s in sums)


def test_pipeline_charts_stage(spark, tmp_path):
    """run_charts writes one PNG per (ticker, chart) plus the four
    combined charts (multi-line, price heatmap, risk boxplot, volume-
    return scatter — the reference's non-line/bar chart types), every
    file a well-formed PNG of the canvas dimensions."""
    import datetime
    import os

    from stock_data_warehouse_analytics_spark.pipeline import run_charts

    rows = []
    base = datetime.date(2024, 1, 1)
    for t in ("AAA", "BBB"):
        for i in range(120):
            d = base + datetime.timedelta(days=i * 3)
            rows.append((t, d, 10.0 + i % 7, 100 + i))
    fact = spark.createDataFrame(rows, ["Ticker", "Date", "Close", "Volume"])
    written = run_charts(spark, fact, str(tmp_path / "charts"))
    assert len(written) == 2 * 3 + 4
    names = {os.path.basename(p) for p in written}
    assert {
        "00_monthly_close_combined.png",
        "03_combined_heatmap_price.png",
        "04_boxplot_risk.png",
        "05_scatter_volume_return.png",
    } <= names
    for path in written:
        with open(path, "rb") as f:
            png = f.read()
        assert _png_dims(png) == (960, 480)


def test_heatmap_scatter_box_render():
    """The three non-line/bar builders: deterministic output, colormap
    endpoints hit (heatmap min→first anchor, max→last anchor), scatter
    draws each series' palette color, boxplot draws the box fill and a
    black median/whisker."""
    import numpy as np

    from stock_data_warehouse_analytics_spark.sources.charts import (
        _CMAPS,
        PALETTE,
        box_plot,
        heatmap,
        scatter_chart,
    )

    hm = heatmap(
        ["R1", "R2"], ["C1", "C2"],
        [[0.0, 1.0], [None, 0.5]],
        title="HM", cmap="coolwarm", annot=False, w=320, h=200,
    )
    png = hm.png()
    assert _png_dims(png) == (320, 200)
    assert heatmap(
        ["R1", "R2"], ["C1", "C2"],
        [[0.0, 1.0], [None, 0.5]],
        title="HM", cmap="coolwarm", annot=False, w=320, h=200,
    ).png() == png
    flat = {tuple(p) for row in _png_pixels(png) for p in row}
    lo_anchor, hi_anchor = _CMAPS["coolwarm"][0], _CMAPS["coolwarm"][-1]
    assert tuple(lo_anchor) in flat  # min cell
    assert tuple(hi_anchor) in flat  # max cell
    assert (210, 210, 210) in flat  # None cell renders GREY

    sc = scatter_chart(
        [("A", [(0.0, 0.0), (1.0, 2.0)]), ("B", [(0.5, 1.0)])],
        title="SC", w=320, h=200,
    )
    flat = {tuple(p) for row in _png_pixels(sc.png()) for p in row}
    assert tuple(PALETTE[0]) in flat and tuple(PALETTE[1]) in flat

    bp = box_plot(
        ["T1", "T2"],
        [(-2.0, -1.0, 0.0, 1.0, 2.0), (0.0, 1.0, 1.5, 2.0, 3.0)],
        title="BP", w=320, h=200,
    )
    px = _png_pixels(bp.png())
    flat = {tuple(p) for row in px for p in row}
    assert tuple(PALETTE[0]) in flat and tuple(PALETTE[1]) in flat
    assert (0, 0, 0) in flat  # median/whisker strokes
    assert isinstance(px, np.ndarray)
