"""Committed-record guards (no Spark).

Round-8 postmortem: scaling_sf1.py's truncate-to-EOF section writer
silently deleted the sf~5 study from SCALING.md (16c92bc clobbered
f244164). These tests pin the known study sections so any writer
regression fails the suite instead of eating committed evidence, and
unit-test the section-bounded writer itself.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def _scaling_text():
    with open(os.path.join(REPO, "SCALING.md")) as f:
        return f.read()


def test_scaling_md_keeps_both_growth_studies():
    text = _scaling_text()
    for header in (
        "## sf0.1 -> sf~1 (10x synthetic, asserted growth algebra)",
        "## sf0.1 -> sf~5 (50x synthetic, asserted growth algebra)",
    ):
        assert header in text, f"SCALING.md lost study section: {header}"
    # each study must still carry its results table, not just the header
    sf1 = text.index("## sf0.1 -> sf~1")
    sf5 = text.index("## sf0.1 -> sf~5")
    assert "| char_entropy_scores |" in text[sf1:sf5]
    assert "| ivf_ann_topk |" in text[sf5:]
    # round-11: the two round-10-verdict scale claims, now measured
    assert "| ivf_bq_ann_topk | ivfbq |" in text[sf5:]
    assert "| personalized_pagerank | frontier |" in text[sf5:]
    # round-12: growth rows for the round-11/12 tranches
    assert "| ngram_decontamination | decon10 |" in text[sf1:sf5]
    assert "| image_jpeg_420_stats | entlin |" in text[sf1:sf5]
    assert "| unigram_lm_trained | mix10 |" in text[sf1:sf5]
    # round-13: the 8-vs-32-core parallelism evidence at sf~1
    # (round-12 verdict item 8)
    assert "## Core scaling at sf~1 (8 vs 32 cores)" in text
    assert "| image_jpeg_420_stats |" in text[
        text.index("## Core scaling at sf~1"):
    ]
    assert "| containment_dup_pairs | exact10 |" in text[sf1:sf5]


def test_scaling_md_keeps_cap_audit():
    text = _scaling_text()
    assert "## Cap audit (round 12)" in text
    assert "`<excluded:len>` sentinel row" in text


def test_replace_section_is_section_bounded(tmp_path):
    from _scaling_md import replace_section

    p = tmp_path / "doc.md"
    p.write_text(
        "# title\n\npreamble\n\n## A\n\nold a\n\n## B\n\nkeep b\n"
    )
    replace_section(str(p), "## A", ["", "new a", ""])
    text = p.read_text()
    assert "new a" in text and "old a" not in text
    assert "preamble" in text and "keep b" in text
    assert text.index("## A") < text.index("## B")
    # replacing the LAST section keeps everything before it
    replace_section(str(p), "## B", ["", "new b", ""])
    text = p.read_text()
    assert "new a" in text and "new b" in text and "keep b" not in text
    # appending a section that doesn't exist yet lands at EOF
    replace_section(str(p), "## C", ["", "c body", ""])
    text = p.read_text()
    assert text.rstrip().endswith("c body")
    assert text.count("## A") == 1 and text.count("## B") == 1
