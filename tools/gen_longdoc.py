"""Generate the LONG-DOCUMENT containment fixture (r10).

The sf replicas have ~52-gram documents, where the exact inverted-index
containment join is cheap per pair and the bottom-k screen cannot pay
for itself (measured: screened 31 s vs exact 16 s at the 30× replica).
The screen's regime is LONG documents — per-pair exact join volume is
~grams/doc rows, the screen probes with a fixed 16 — so this fixture
holds that variable at ~3000 grams/doc with replica-style clone groups:

  100 original docs × 3000 unique-ish words, each cloned 30× with a
  per-copy marker token (the gen_scaled.py recipe), plus 10% of each
  doc drawn from a shared boilerplate pool so incidental cross-original
  overlaps exist. ~3000 docs, ~9M index rows — the same index size as
  the 30× replica, with the opposite doc-length shape.

Usage: python tools/gen_longdoc.py [OUT_DIR] [N_ORIG] [N_CLONES] [N_WORDS]

The two committed fixtures are EXACTLY these invocations (r10 ADVICE —
deterministic, no RNG, so a rebuild is byte-stable on the same
pyarrow; both are re-generatable rather than sacred binaries):

  python tools/gen_longdoc.py testdata_longdoc                # defaults
    -> 100 orig x 30 clones x 3000 grams/doc = 3,000 docs (long-doc
       shape: per-pair exact join volume ~3000 rows, screen probes 16)
  python tools/gen_longdoc.py testdata_bigclone 30 150 2000
    -> 30 orig x 150 clones x 2000 grams/doc = 4,500 docs (big-clone
       shape: 150-deep clone groups blow up the containment
       self-join's Sigma df^2 term to ~670M pair rows — the fixture
       built to favor a candidate screen; see BASELINE.md r10 table)
  python tools/gen_longdoc.py testdata_exactclone 30 150 2000 punct
    -> same shape, but the per-copy marker is PUNCTUATION-ONLY
       ('!' * (c+1)) so clones are byte-distinct yet NORMALIZED-EXACT
       duplicates of their original: the r11 upstream-collapse
       measurement fixture (BASELINE.md "r11: containment upstream
       collapse"). All non-marker tokens are identical across a clone
       group, so bare containment still pays the full Sigma df^2 pair
       volume while the collapse tier folds each group to one
       survivor. NOT committed — regenerate with this exact command
       (deterministic, no RNG).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "testdata_longdoc")
    out.mkdir(parents=True, exist_ok=True)
    n_orig = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    n_clones = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    n_words = int(sys.argv[4]) if len(sys.argv) > 4 else 3000
    # marker style: 'token' (default; alphanumeric marker survives
    # normalization — clones are near-dups) vs 'punct' (punctuation-only
    # marker is deleted by normalization — clones are normalized-exact
    # duplicates; the upstream-collapse measurement shape)
    marker_style = sys.argv[5] if len(sys.argv) > 5 else "token"
    boiler = [f"common{i:04d}" for i in range(400)]
    ids, langs, texts = [], [], []
    doc_id = 0
    for o in range(n_orig):
        words = []
        for w in range(n_words):
            if (w * 31 + o) % 10 == 0:  # ~10% shared boilerplate
                words.append(boiler[(o * 131 + w * 17) % len(boiler)])
            else:
                words.append(f"o{o:03d}w{(w * 2654435761) % 99991:05d}")
        base = " ".join(words)
        for c in range(n_clones):
            ids.append(doc_id)
            langs.append(["en", "fr", "de"][o % 3])
            # per-copy marker so clones are never byte-identical
            if marker_style == "punct":
                # punctuation-only: normalize_text deletes it, so the
                # clone group is one normalized-exact group
                texts.append("!" * (c + 1) + f" {base}")
            else:
                texts.append(f"copy{c:02d}tag {base}")
            doc_id += 1
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(tbl, out / "documents.parquet")
    print(f"{out}/documents.parquet: {len(ids)} docs, ~{n_words} grams/doc")


if __name__ == "__main__":
    main()
