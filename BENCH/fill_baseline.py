"""Render BENCH/results/*.json into the BENCH/BASELINE.md table."""

import json
from pathlib import Path

ROOT = Path(__file__).resolve().parent

LABELS = {
    "extract": "extraction (sequences → raw points)",
    "raw_to_1m": "raw → 1m rollup",
    "1m_to_1h": "1m → 1h cascade",
    "1h_to_1d": "1h → 1d cascade",
    "codec_encode": "codec segment encode",
}


def table(path: Path, title: str) -> str:
    s = json.loads(path.read_text())
    lines = [
        f"### {title}",
        "",
        "| stage | points in | thr @8 cores (pts/s) | thr @32 cores (pts/s) | efficiency 8→32 |",
        "| --- | --- | --- | --- | --- |",
    ]
    for st, lab in LABELS.items():
        if st not in s["stages"]:
            continue
        row = s["stages"][st]
        pts = s["levels"]["8"][st]["points_in"]
        lines.append(
            f"| {lab} | {pts:,} | {row['thr_8']:,.0f} | {row['thr_32']:,.0f} | **{row['efficiency']:.2f}** |"
        )
    ceil = s.get("cpu_ceiling_8_to_32", [])
    lines.append("")
    lines.append(
        f"CPU-control ceiling sampled in the same window: "
        f"{', '.join(f'{c:.2f}' for c in ceil)} (pure-CPU multiprocessing, no Spark)."
    )
    return "\n".join(lines)


if __name__ == "__main__":
    parts = []
    disk = ROOT / "results" / "scaling_50M_disk.json"
    shm = ROOT / "results" / "scaling_50M_tmpfs.json"
    if disk.exists():
        parts.append(table(disk, "50M raw points, shuffle on disk (/tmp), 2 interleaved rounds × 3 reps"))
    if shm.exists():
        parts.append(table(shm, "50M raw points, shuffle on tmpfs (/dev/shm), 1 round × 3 reps"))
    md = ROOT / "BASELINE.md"
    text = md.read_text()
    marker = "<!-- SCALING_TABLE -->"
    out = text.replace(marker, marker + "\n\n" + "\n\n".join(parts))
    md.write_text(out)
    print("filled", md)
