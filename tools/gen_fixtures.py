"""Generate the committed mediacounts TSV fixtures (FIXTURES.md §B).

Deterministic (no RNG): mirrors the Wikimedia mediacounts daily-dump
format the reference ingests (REF LogProcessor::download/parse; public
dataset README — 26 tab-separated columns, '-' placeholders). Three
files:

- mediacounts.2024-01-01.v00.tsv / 2024-01-02: clean days; include
  non-media rows (filtered out), URL-encoded filenames (%20 only — the
  DuckDB oracle lacks url_decode, so fixtures restrict escapes to %20),
  and duplicate rows for one file (aggregation, not blind insert).
- mediacounts.2024-01-03.v00.tsv: contains malformed rows (non-numeric
  transfer counts, short row) for the corrupt-record routing path.

Run: python tools/gen_fixtures.py   (idempotent; output is committed)
"""

from __future__ import annotations

import pathlib

OUT = pathlib.Path(__file__).resolve().parent.parent / "fixtures" / "mediacounts"

MEDIA = [
    # (path, total_bytes, total_transfers, original, audio, video)
    ("/wikipedia/commons/a/ab/Accordion%20solo.ogg", 91234, 40, 10, 25, 0),
    ("/wikipedia/commons/b/bc/Bird%20song.wav", 55000, 12, 2, 10, 0),
    ("/wikipedia/commons/c/cd/Concert.ogv", 990000, 300, 100, 0, 180),
    ("/wikipedia/commons/d/de/Dance%20clip.webm", 880000, 150, 50, 0, 90),
    ("/wikipedia/commons/e/ef/Etude.flac", 44000, 9, 3, 6, 0),
    ("/wikipedia/commons/f/fg/Fanfare.mid", 1200, 5, 5, 0, 0),
    ("/wikipedia/commons/a/aa/Anthem.oga", 30000, 22, 2, 18, 0),
    # non-media rows: must be filtered out by extension whitelist
    ("/wikipedia/commons/9/99/Portrait.jpg", 150000, 500, 500, 0, 0),
    ("/wikipedia/commons/8/88/Diagram.svg", 20000, 80, 80, 0, 0),
    ("/wikipedia/commons/7/77/Scan.pdf", 400000, 30, 30, 0, 0),
]


def row(path: str, b: int, t: int, orig: int, audio: int, video: int) -> str:
    cols = [path, str(b), str(t), str(orig)]
    cols += ["-"] * 12          # 4..15 reserved
    cols += [str(audio), "-", str(video)]  # 16, 17, 18
    cols += ["-"] * 7           # 19..25
    assert len(cols) == 26
    return "\t".join(cols)


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    for day, mult in (("2024-01-01", 1), ("2024-01-02", 2)):
        lines = [
            row(p, b * mult, t * mult, o * mult, a * mult, v * mult)
            for (p, b, t, o, a, v) in MEDIA
        ]
        # duplicate rows for the same file on day 1: ingest must SUM,
        # not blind-insert (SURVEY.md §3.1 stage 5).
        if day == "2024-01-01":
            lines.append(row("/wikipedia/commons/c/cd/Concert.ogv", 10000, 7, 2, 0, 5))
        (OUT / f"mediacounts.{day}.v00.tsv").write_text("\n".join(lines) + "\n")

    # corrupt day: two malformed rows among good ones
    good = [row(p, b, t, o, a, v) for (p, b, t, o, a, v) in MEDIA[:4]]
    bad = [
        # non-numeric transfer count -> type-cast failure
        "\t".join(
            ["/wikipedia/commons/x/xx/Broken.ogv", "1000", "oops", "3"]
            + ["-"] * 12 + ["4", "-", "5"] + ["-"] * 7
        ),
        # short row (truncated write)
        "/wikipedia/commons/y/yy/Truncated.webm\t123",
    ]
    lines = good[:2] + bad[:1] + good[2:] + bad[1:]
    (OUT / "mediacounts.2024-01-03.v00.tsv").write_text("\n".join(lines) + "\n")
    print(f"wrote fixtures to {OUT}")


if __name__ == "__main__":
    main()
