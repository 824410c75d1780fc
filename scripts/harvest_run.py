"""Harvest a training run's tensorboard event files into a PARITY table.

Reads the tfevents files a trainer run wrote (utils/logging.py, tensorboardX)
WITHOUT tensorflow: the TFRecord framing is parsed by hand and the Event
proto decoded with tensorboardX's own bundled event_pb2.  Emits the
learning-proof artifacts: per-eval-epoch (loss, AP, AP50) markdown rows and
a JSON dump of the tracked scalar curves.

Usage:
    python scripts/harvest_run.py runs/proof_r3b/logs [--json out.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import struct
import sys

# Tags as stored (tensorboardX sanitizes spaces/parens to underscores).
AP_TAG = "Average_Precision/AP"
AP50_TAG = "Average_Precision/AP50"
TRAIN_LOSS_TAG = "loss/total/train"
VAL_LOSS_TAG = "loss/total/val"
EPOCH_TAG = "epoch"


def iter_events(path: str):
    """Yield Event protos from one tfevents file (TFRecord framing:
    8-byte LE length, 4-byte masked crc of length, payload, 4-byte crc)."""
    from tensorboardX.proto import event_pb2

    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                return
            (length,) = struct.unpack("<Q", header)
            f.read(4)  # length crc (unchecked: files are local, same host)
            payload = f.read(length)
            if len(payload) < length:
                return  # truncated tail (writer was killed mid-record)
            f.read(4)  # payload crc
            ev = event_pb2.Event()
            try:
                ev.ParseFromString(payload)
            except Exception:
                return
            yield ev


def harvest(logdir: str) -> dict[str, list[tuple[int, float]]]:
    """tag -> [(step, value)] across every event file in the dir, merged in
    file order (a relaunched run appends a new file; later files win on
    duplicate steps)."""
    series: dict[str, dict[int, float]] = {}
    for path in sorted(glob.glob(os.path.join(logdir, "events.out.tfevents.*"))):
        for ev in iter_events(path):
            if not ev.HasField("summary"):
                continue
            for v in ev.summary.value:
                if v.HasField("simple_value"):
                    series.setdefault(v.tag, {})[ev.step] = v.simple_value
    return {t: sorted(d.items()) for t, d in series.items()}


def make_table(series: dict[str, list[tuple[int, float]]]) -> str:
    """Render the learning-proof markdown table from harvested curves."""
    # step -> epoch map (the trainer logs the epoch scalar alongside loss).
    epoch_at = dict(series.get(EPOCH_TAG, []))

    def epoch_for(step: int) -> int:
        best = -1
        for s, e in sorted(epoch_at.items()):
            if s <= step:
                best = int(e)
        return best

    train_loss = dict(series.get(TRAIN_LOSS_TAG, []))
    val_loss = dict(series.get(VAL_LOSS_TAG, []))
    ap50 = dict(series.get(AP50_TAG, []))
    rows = [
        "| epoch | train loss (at eval step) | val loss | AP | AP50 |",
        "|---|---|---|---|---|",
    ]
    for step, ap_v in series.get(AP_TAG, []):
        tl = [v for s, v in sorted(train_loss.items()) if s <= step]
        rows.append(
            (f"| {epoch_for(step)} | {tl[-1]:.2f} " if tl else f"| {epoch_for(step)} | — ")
            + f"| {val_loss.get(step, float('nan')):.2f} "
            + f"| {ap_v:.3f} | {ap50.get(step, float('nan')):.3f} |"
        )
    return "\n".join(rows)


def merge_tables(existing: str, fresh: str) -> str:
    """Row-merge two harvest tables on the epoch column, fresh rows winning.

    A VM reset wipes the tfevents files, so a naive replace would silently
    drop every pre-reset row from the committed cumulative curve; merging
    keeps rows harvested by earlier loops that the current logdir no
    longer knows about."""
    def epoch_of(line: str):
        parts = [p.strip() for p in line.strip().strip("|").split("|")]
        # data rows lead with a (possibly negative) integer epoch
        return parts[0] if parts and parts[0].lstrip("-").isdigit() else None

    def rows_of(t: str) -> dict[str, str]:
        return {
            e: line.rstrip()
            for line in t.splitlines()
            if (e := epoch_of(line)) is not None
        }

    header = [
        ln.rstrip()
        for ln in fresh.splitlines()
        if ln.strip().startswith("|") and epoch_of(ln) is None
    ][:2]
    merged = rows_of(existing)
    merged.update(rows_of(fresh))
    body = [merged[k] for k in sorted(merged, key=int)]
    return "\n".join(header + body)


def splice_parity(path: str, key: str, table: str) -> bool:
    """Merge `table` into the block between `<!-- HARVEST:key -->` markers
    in `path` (row-merge on epoch: committed pre-reset rows survive a
    wiped logdir).  Returns True when the file content changed."""
    begin, end = f"<!-- HARVEST:{key} -->", f"<!-- /HARVEST:{key} -->"
    text = open(path).read()
    i, j = text.find(begin), text.find(end)
    if i < 0 or j < 0 or j < i:
        raise SystemExit(f"markers {begin!r}/{end!r} not found in {path}")
    existing = text[i + len(begin):j]
    merged = merge_tables(existing, table)
    new = text[: i + len(begin)] + "\n" + merged + "\n" + text[j:]
    if new == text:
        return False
    with open(path, "w") as f:
        f.write(new)
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--json", default=None, help="also dump raw curves here")
    ap.add_argument(
        "--parity",
        default=None,
        metavar="FILE",
        help="splice the table between the <!-- HARVEST:<key> --> markers",
    )
    ap.add_argument("--key", default="proof_r3b", help="marker key for --parity")
    args = ap.parse_args()

    series = harvest(args.logdir)
    if not series:
        print(f"no scalar events under {args.logdir}", file=sys.stderr)
        return 1

    table = make_table(series)
    print(f"# tags: {sorted(series)}\n")
    print(table)

    if args.parity:
        changed = splice_parity(args.parity, args.key, table)
        print(f"\n{args.parity}: {'updated' if changed else 'unchanged'}", file=sys.stderr)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(series, f)
        print(f"\nwrote {args.json}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
