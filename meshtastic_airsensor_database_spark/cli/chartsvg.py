"""Pure-Python SVG chart rendering (graphdata.py:99-192 parity).

The reference renders six matplotlib comparison figures (PurpleAir vs
AIRWISE nodes per metric), fixing the particulate-matter charts to a
0-15 y-axis (graphdata.py PM subplots). matplotlib is absent here, so
the engine renders the same figures as standalone SVG — no pixel
rasterizer, no dependency, deterministic byte-for-byte output.

Charting is a DRIVER-side concern over an already-aggregated frame:
the input is the `timeseries_align` result (one row per bucket ×
source), whose cardinality is bounded by chart legibility long before
it is bounded by memory. Nothing here touches executors.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

# graphdata.py PM-chart y-limit parity
PM_Y_LIMITS = (0.0, 15.0)

# colorblind-safe cycle (Okabe-Ito), fixed order for determinism
PALETTE = (
    "#0072B2", "#E69F00", "#009E73", "#D55E00",
    "#CC79A7", "#56B4E9", "#F0E442", "#000000",
)

WIDTH, HEIGHT = 960, 540
MARGIN_L, MARGIN_R, MARGIN_T, MARGIN_B = 70, 160, 50, 50
N_TICKS = 5


def _fmt_num(v: float) -> str:
    s = f"{v:.6g}"
    return s


def _ticks(lo: float, hi: float, n: int = N_TICKS) -> list[float]:
    if hi <= lo:
        return [lo]
    step = (hi - lo) / (n - 1)
    return [lo + i * step for i in range(n)]


def render_line_chart_svg(
    series: dict[str, list[tuple[float, float]]],
    title: str = "",
    y_limits: tuple[float, float] | None = None,
    x_labeler=None,
) -> str:
    """One SVG line chart: ``series`` maps legend name -> [(x, y)]
    points (x ascending, typically epoch seconds). ``y_limits`` pins
    the y-axis (the reference's PM ylim); None autoscales to the data.
    Points outside pinned limits are clipped to the plot area, matching
    matplotlib ylim view-clipping.

    Returns the SVG document as a string. Deterministic: same input,
    same bytes (series iterate in insertion order, palette is fixed).
    """
    plot_w = WIDTH - MARGIN_L - MARGIN_R
    plot_h = HEIGHT - MARGIN_T - MARGIN_B

    xs = [x for pts in series.values() for x, _ in pts]
    ys = [y for pts in series.values() for _, y in pts]
    x_lo, x_hi = (min(xs), max(xs)) if xs else (0.0, 1.0)
    if x_hi == x_lo:
        x_hi = x_lo + 1.0
    if y_limits is not None:
        y_lo, y_hi = y_limits
    elif ys:
        y_lo, y_hi = min(ys), max(ys)
        if y_hi == y_lo:
            y_hi = y_lo + 1.0
        pad = (y_hi - y_lo) * 0.05
        y_lo, y_hi = y_lo - pad, y_hi + pad
    else:
        y_lo, y_hi = 0.0, 1.0

    def sx(x: float) -> float:
        return MARGIN_L + (x - x_lo) / (x_hi - x_lo) * plot_w

    def sy(y: float) -> float:
        return MARGIN_T + (y_hi - y) / (y_hi - y_lo) * plot_h

    out: list[str] = []
    out.append(
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{WIDTH}" '
        f'height="{HEIGHT}" viewBox="0 0 {WIDTH} {HEIGHT}" '
        f'font-family="sans-serif">'
    )
    out.append(
        '<defs><clipPath id="plot"><rect '
        f'x="{MARGIN_L}" y="{MARGIN_T}" width="{plot_w}" height="{plot_h}"/>'
        "</clipPath></defs>"
    )
    out.append(f'<rect width="{WIDTH}" height="{HEIGHT}" fill="white"/>')
    if title:
        out.append(
            f'<text x="{WIDTH / 2:g}" y="30" text-anchor="middle" '
            f'font-size="18">{escape(title)}</text>'
        )

    # axes + gridlines + tick labels
    out.append(
        f'<rect x="{MARGIN_L}" y="{MARGIN_T}" width="{plot_w}" '
        f'height="{plot_h}" fill="none" stroke="#333"/>'
    )
    for ty in _ticks(y_lo, y_hi):
        py = sy(ty)
        out.append(
            f'<line x1="{MARGIN_L}" y1="{py:.2f}" x2="{MARGIN_L + plot_w}" '
            f'y2="{py:.2f}" stroke="#ddd"/>'
        )
        out.append(
            f'<text x="{MARGIN_L - 8}" y="{py + 4:.2f}" text-anchor="end" '
            f'font-size="12">{_fmt_num(ty)}</text>'
        )
    for tx in _ticks(x_lo, x_hi):
        px = sx(tx)
        label = x_labeler(tx) if x_labeler else _fmt_num(tx)
        out.append(
            f'<text x="{px:.2f}" y="{MARGIN_T + plot_h + 18}" '
            f'text-anchor="middle" font-size="12">{escape(str(label))}</text>'
        )

    # series polylines (clipped to the plot area) + legend
    for i, (name, pts) in enumerate(series.items()):
        color = PALETTE[i % len(PALETTE)]
        if pts:
            coords = " ".join(f"{sx(x):.2f},{sy(y):.2f}" for x, y in pts)
            out.append(
                f'<polyline points="{coords}" fill="none" stroke="{color}" '
                f'stroke-width="1.5" clip-path="url(#plot)"/>'
            )
        ly = MARGIN_T + 16 * i
        lx = MARGIN_L + plot_w + 12
        out.append(
            f'<line x1="{lx}" y1="{ly + 6}" x2="{lx + 18}" y2="{ly + 6}" '
            f'stroke="{color}" stroke-width="3"/>'
        )
        out.append(
            f'<text x="{lx + 24}" y="{ly + 10}" font-size="12">'
            f"{escape(name)}</text>"
        )

    out.append("</svg>")
    return "\n".join(out)


def aligned_rows_to_series(rows) -> dict[str, list[tuple[float, float]]]:
    """`timeseries_align` rows -> chart series: source -> sorted
    (epoch_s, avg_value) points. Driver-side over the small aggregated
    result only."""
    series: dict[str, list[tuple[float, float]]] = {}
    for r in rows:
        if r["avg_value"] is None:
            continue
        series.setdefault(r["source"], []).append(
            (r["bucket_ts"].timestamp(), float(r["avg_value"]))
        )
    return {name: sorted(pts) for name, pts in sorted(series.items())}
