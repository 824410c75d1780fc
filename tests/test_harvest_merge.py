"""HARVEST-block merge semantics (advisor round-4 low #5).

A VM reset wipes a run's tfevents files; the harvest loop then re-renders
the learning-proof table from the surviving logdir only.  splice_parity
must ROW-MERGE (on the epoch column) into the committed block — replacing
it would silently drop every pre-reset row, which is exactly what happened
to proof_r3b's epochs 1-16 in round 3/4.
"""

import importlib.util
import os
import sys

spec = importlib.util.spec_from_file_location(
    "harvest_run",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "harvest_run.py"),
)
harvest_run = importlib.util.module_from_spec(spec)
sys.modules["harvest_run"] = harvest_run
spec.loader.exec_module(harvest_run)

HEADER = (
    "| epoch | train loss (at eval step) | val loss | AP | AP50 |\n"
    "|---|---|---|---|---|"
)

PRE_RESET = (
    HEADER
    + "\n| 1 | 57.24 | 61.25 | 0.000 | 0.000 |"
    + "\n| 6 | 34.33 | 55.62 | 0.000 | 0.000 |"
    + "\n| 21 | 32.96 | 54.90 | 0.000 | 0.000 |"
)

POST_RESET = (
    HEADER
    + "\n| 21 | 33.83 | 56.39 | 0.010 | 0.020 |"
    + "\n| 26 | 31.33 | 55.11 | 0.050 | 0.110 |"
)


def test_merge_preserves_pre_reset_rows():
    merged = harvest_run.merge_tables(PRE_RESET, POST_RESET)
    lines = merged.splitlines()
    assert lines[0].startswith("| epoch |") and lines[1].startswith("|---")
    epochs = [ln.split("|")[1].strip() for ln in lines[2:]]
    # pre-reset epochs 1/6 survive; rows stay epoch-sorted
    assert epochs == ["1", "6", "21", "26"]


def test_merge_fresh_row_wins_on_duplicate_epoch():
    merged = harvest_run.merge_tables(PRE_RESET, POST_RESET)
    (row21,) = [ln for ln in merged.splitlines() if ln.startswith("| 21 ")]
    assert "33.83" in row21 and "0.010" in row21  # fresh, not 32.96


def test_merge_with_empty_existing_block():
    merged = harvest_run.merge_tables("\n", POST_RESET)
    assert merged.splitlines()[2:] == POST_RESET.splitlines()[2:]


def test_splice_parity_round_trip(tmp_path):
    doc = tmp_path / "PARITY.md"
    doc.write_text(
        "intro\n<!-- HARVEST:run -->\n"
        + PRE_RESET
        + "\n<!-- /HARVEST:run -->\ntail\n"
    )
    changed = harvest_run.splice_parity(str(doc), "run", POST_RESET)
    assert changed
    text = doc.read_text()
    assert "| 1 | 57.24" in text and "| 26 | 31.33" in text
    assert text.count("| 21 ") == 1 and "33.83" in text
    # idempotent: splicing the same fresh table again changes nothing
    assert not harvest_run.splice_parity(str(doc), "run", POST_RESET)
