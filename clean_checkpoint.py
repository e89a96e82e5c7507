"""Checkpoint GC: delete all but the latest checkpoint per run directory.

Reference: clean_checkpoint.py (tree print + freed-bytes report).
Usage: ``python clean_checkpoint.py [base_dir] [--dry-run]``.
"""

import argparse

from hilcodec_tpu.utils.checkpoint import clean_checkpoints


def main():
    p = argparse.ArgumentParser()
    p.add_argument("base_dir", nargs="?", default="logs")
    p.add_argument("--dry-run", action="store_true")
    ns = p.parse_args()
    removed = clean_checkpoints(ns.base_dir, dry_run=ns.dry_run)
    total = 0
    for path, size in removed:
        print(("would remove " if ns.dry_run else "removed ") + path)
        total += size
    print(f"freed {total / 1e6:.1f} MB"
          + (" (dry run)" if ns.dry_run else ""))


if __name__ == "__main__":
    main()
