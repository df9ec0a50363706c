"""Regenerate the perf tables in COVERAGE.md / README.md from bench JSON.

r2 VERDICT weakness: the repo's own prose tables went stale while the code
got faster.  This tool makes the evidence mechanical: the ONLY source of
the published numbers is the committed bench artifacts

    BENCH_MATRIX.jsonl   — one line per config from tools/bench_matrix.py
    BENCH_SCALING.jsonl  — one line per (mode, S) from tools/bench_scaling.py

and the tables are rewritten in place between marker comments:

    <!-- BENCH_MATRIX_TABLE --> ... <!-- /BENCH_MATRIX_TABLE -->
    <!-- BENCH_SCALING_TABLE --> ... <!-- /BENCH_SCALING_TABLE -->

Usage:
    python tools/bench_matrix.py  --json-out BENCH_MATRIX.jsonl   # on TPU
    python tools/bench_scaling.py --json-out BENCH_SCALING.jsonl  # on TPU
    python tools/update_coverage.py
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LABELS = {
    "640x480_gray_stabilization": "640×480 gray stabilization (minimum slice)",
    "1080p_homography_stabilization":
        "1080p stabilization (homography, EASU warp = reference default)",
    "1080p_homography_stabilization_bilinear":
        "1080p stabilization (homography, bilinear fast option)",
    "1080p_mesh_stabilization":
        "1080p stabilization (16×16 mesh, EASU warp)",
    "1080p_mesh_stabilization_bilinear":
        "1080p stabilization (16×16 mesh, bilinear)",
    "1080p_deblock": "1080p adaptive de-blocking",
    "1080p_to_4k_easu_rcas": "EASU 2× upscale 1080p → 4K + RCAS",
    "4k_homography_stabilization":
        "4K-native stabilization (homography, EASU warp)",
    "4k_homography_stabilization_bilinear":
        "4K-native stabilization (homography, bilinear)",
    "4k_mesh_stabilization": "4K-native stabilization (16×16 mesh, EASU warp)",
    "4k_mesh_stabilization_bilinear":
        "4K-native stabilization (16×16 mesh, bilinear)",
    "4k_deblock": "4K-native adaptive de-blocking",
    "4k_cas": "4K-native CAS sharpening",
    "4k_full_chain_fused":
        "4K full chain vs(mesh,EASU)+adb+cas, ONE fused program",
}

TARGETS = {
    "1080p_homography_stabilization": "< 8",
    "1080p_mesh_stabilization": "< 8",
    "1080p_deblock": "(ref. GPU budget 3.0)",
    "1080p_to_4k_easu_rcas": "4K60 chain ≈ 16.6",
    "4k_homography_stabilization": "4K60 chain ≈ 16.6",
    "4k_mesh_stabilization": "4K60 chain ≈ 16.6",
    "4k_deblock": "4K60 chain ≈ 16.6",
    "4k_cas": "4K60 chain ≈ 16.6",
    "4k_full_chain_fused": "< 16.6 (whole budget)",
}


def _read_jsonl(name):
    path = os.path.join(REPO, name)
    if not os.path.exists(path):
        return []
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def matrix_table() -> str:
    rows = _read_jsonl("BENCH_MATRIX.jsonl")
    if not rows:
        return "(no BENCH_MATRIX.jsonl — run tools/bench_matrix.py --json-out)"
    # Last measurement per config wins.
    latest = {}
    for r in rows:
        latest[r["config"]] = r
    out = ["| Workload | ms/frame | Baseline target |", "|---|---|---|"]
    for key, label in LABELS.items():
        if key in latest:
            out.append(
                f"| {label} | {latest[key]['value']:.2f} | "
                f"{TARGETS.get(key, '—')} |"
            )
    return "\n".join(out)


def scaling_table() -> str:
    rows = _read_jsonl("BENCH_SCALING.jsonl")
    if not rows:
        return "(no BENCH_SCALING.jsonl — run tools/bench_scaling.py --json-out)"
    latest = {}
    for r in rows:
        # Pre-r4 rows predate the warp_filter knob; they measured bilinear.
        wf = r.get("warp_filter", "bilinear")
        latest[(r["mode"], wf, r["streams"], r["size"])] = r
    out = [
        "| Mode | Warp filter | Size | Streams | ms/step | frames/s "
        "| Scaling efficiency |",
        "|---|---|---|---|---|---|---|",
    ]
    for (mode, wf, s, size), r in sorted(latest.items()):
        out.append(
            f"| {mode} | {wf} | {size} | {s} | {r['ms_per_step']:.2f} | "
            f"{r['frames_per_s']:.0f} | {r['scaling_efficiency']:.3f} |"
        )
    return "\n".join(out)


def rewrite(path: str, tag: str, body: str) -> bool:
    with open(path) as f:
        text = f.read()
    pat = re.compile(
        rf"(<!-- {tag} -->\n).*?(<!-- /{tag} -->)", re.DOTALL
    )
    if not pat.search(text):
        return False
    new = pat.sub(lambda m: m.group(1) + body + "\n" + m.group(2), text)
    with open(path, "w") as f:
        f.write(new)
    return True


def main() -> int:
    mt = matrix_table()
    st = scaling_table()
    changed = []
    for fname in ("COVERAGE.md", "README.md"):
        path = os.path.join(REPO, fname)
        if not os.path.exists(path):
            continue
        did = rewrite(path, "BENCH_MATRIX_TABLE", mt)
        did |= rewrite(path, "BENCH_SCALING_TABLE", st)
        if did:
            changed.append(fname)
    print(f"updated: {', '.join(changed) or 'nothing (no markers found)'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
