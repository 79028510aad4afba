"""CLI parity test: the reference's flag surface (server.py:204-214)
must run end-to-end and produce n_reduce 'word count' output files."""

from __future__ import annotations

import glob


def _read_counts(out_dir: str) -> dict[str, int]:
    counts: dict[str, int] = {}
    for f in glob.glob(f"{out_dir}/part-*"):
        if f.endswith(".crc"):
            continue
        with open(f) as fh:
            for ln in fh:
                if ln.strip():
                    w, c = ln.rsplit(" ", 1)
                    counts[w] = counts.get(w, 0) + int(c)
    return counts


def test_cli_reproduces_reference_corpus_totals(spark, tmp_path):
    """Run the CLI against the reference's own input corpus (read-only)
    and check the golden totals from SURVEY.md §6.1: 608,306 tokens /
    23,703 distinct case-insensitive words."""
    import os

    corpus = "/root/reference/inputs"
    if not os.path.isdir(corpus):
        import pytest

        pytest.skip("reference corpus not present")
    from mapreducecf_spark.cli import run

    out = run(
        [
            "--input_folder",
            corpus,
            "--n_reduce",
            "4",
            "--output_folder",
            str(tmp_path / "ref_out"),
        ]
    )
    counts = _read_counts(out)
    assert len(counts) == 23703
    assert sum(counts.values()) == 608306
    assert counts["the"] == 32418  # golden top word


def test_cli_reference_flags_end_to_end(spark, tmp_path):
    from mapreducecf_spark.cli import run

    d = tmp_path / "inputs"
    d.mkdir()
    (d / "a.txt").write_text("Hello world hello World!\n")
    (d / "b.txt").write_text("world is one-token\n")
    (d / "skip.csv").write_text("never read\n")

    out = run(["--input_folder", str(d), "--n_map", "6", "--n_reduce", "2"])
    files = [f for f in glob.glob(f"{out}/part-*") if not f.endswith(".crc")]
    assert len(files) == 2  # n_reduce -> output file count (K1 layout)
    assert _read_counts(out) == {
        "hello": 2,
        "world": 3,
        "is": 1,
        "onetoken": 1,  # punctuation deleted, not replaced with space
    }

    # case-sensitive mode, overwrite lifecycle (K2): rerun on same out dir
    run(
        [
            "--input_folder",
            str(d),
            "--n_reduce",
            "1",
            "--case_sensitive",
            "--output_folder",
            str(tmp_path / "out2"),
        ]
    )
    cs = _read_counts(str(tmp_path / "out2"))
    assert cs["Hello"] == 1 and cs["hello"] == 1 and cs["World"] == 1
