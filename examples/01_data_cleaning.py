"""Dataset inspection & cleaning walkthrough — fills the reference's empty
``notebook/01_data_cleaning.ipynb`` placeholder with runnable content.

Validates a pairs CSV (columns, image existence, caption stats), reports
issues, and optionally writes a cleaned copy.

Run: python examples/01_data_cleaning.py [--csv data/text/train_fashion.csv]
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--csv", default="data/text/train_fashion.csv")
    p.add_argument("--image-root", default=".")
    p.add_argument("--out", default=None, help="write cleaned CSV here")
    args = p.parse_args()

    rows, missing, empty_text, dupes = [], [], [], 0
    seen = set()
    with open(args.csv, newline="", encoding="utf-8") as f:
        reader = csv.DictReader(f)
        if not {"image_path", "text"} <= set(reader.fieldnames or []):
            print(f"ERROR: expected image_path,text columns, got {reader.fieldnames}")
            return 1
        for row in reader:
            path = row["image_path"]
            resolved = path if os.path.isabs(path) else os.path.join(args.image_root, path)
            if not os.path.exists(resolved):
                missing.append(path)
                continue
            if not row["text"].strip():
                empty_text.append(path)
                continue
            key = (path, row["text"])
            if key in seen:
                dupes += 1
                continue
            seen.add(key)
            rows.append(row)

    lens = [len(r["text"]) for r in rows]
    print(f"rows kept            : {len(rows)}")
    print(f"missing images       : {len(missing)}")
    print(f"empty captions       : {len(empty_text)}")
    print(f"duplicate pairs      : {dupes}")
    if lens:
        print(f"caption length chars : min {min(lens)} / avg {sum(lens)/len(lens):.0f} / max {max(lens)}")
    from clip_lora_match_tpu.tokenizer import ClipTokenizer

    tok = ClipTokenizer.from_dir(None)
    tok_lens = [len(tok.encode(r["text"])) for r in rows[:500]]
    if tok_lens:
        over = sum(1 for n in tok_lens if n > 77)
        print(f"token lengths (first 500): avg {sum(tok_lens)/len(tok_lens):.0f}, "
              f"max {max(tok_lens)}, over-77 {over}")
    if args.out:
        with open(args.out, "w", newline="", encoding="utf-8") as f:
            w = csv.DictWriter(f, fieldnames=["image_path", "text"])
            w.writeheader()
            w.writerows(rows)
        print(f"cleaned CSV -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
