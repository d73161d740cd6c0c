"""Generate a structured synthetic fashion corpus at reference scale.

The reference's quality result is measured over ~4.4k fashion image–caption
pairs (ref:data/text/val_fashion.csv, ref:results/model_comparison.json).
With zero egress the Kaggle images can't be fetched, so this generator
renders ATTRIBUTE-GROUNDED images — every caption attribute (colour, article
type, pattern, gender, category) has a deterministic visual encoding — which
makes the contrastive task genuinely learnable: a LoRA-tuned CLIP must align
word↔pixel attributes to win, exactly the mechanism behind the reference's
+46% recall@1 lift.

Captions follow the reference's template (ref:scripts/build_fashion_csv.py:58-66):
    "{displayName}, {colour} {articleType} for {gender}, category {master}/{sub}"

Deterministic for a given seed; images are regenerable and NOT meant to be
committed (see data/fashion_synth/.gitignore).
"""

import argparse
import os
import random

from PIL import Image, ImageDraw

COLOURS = {
    "black": (20, 20, 20), "white": (240, 240, 240), "red": (200, 30, 30),
    "blue": (30, 60, 200), "green": (30, 160, 60), "yellow": (230, 210, 40),
    "pink": (240, 120, 180), "purple": (130, 40, 180), "orange": (240, 140, 30),
    "brown": (130, 80, 40), "grey": (128, 128, 128), "navy": (20, 30, 90),
}
# article → (shape kind, sub-category, master hint)
ARTICLES = {
    "tshirt": ("torso", "Topwear", "Apparel"),
    "shirt": ("torso_tall", "Topwear", "Apparel"),
    "jeans": ("legs", "Bottomwear", "Apparel"),
    "leggings": ("legs_thin", "Bottomwear", "Apparel"),
    "shoes": ("foot", "Shoes", "Footwear"),
    "sandals": ("foot_open", "Sandal", "Footwear"),
    "watch": ("disc", "Watches", "Accessories"),
    "backpack": ("trapezoid", "Bags", "Accessories"),
    "sunglasses": ("twin_disc", "Eyewear", "Accessories"),
    "perfume": ("bottle", "Fragrance", "Personal Care"),
}
GENDERS = {"men": (40, 90, 200), "women": (200, 60, 120), "unisex": (90, 180, 90)}
PATTERNS = ("plain", "striped", "dotted", "checked")
MASTER_CORNER = {"Apparel": 0, "Footwear": 1, "Accessories": 2, "Personal Care": 3}

S = 224  # rendered size


def _shade(rgb, f=0.5):
    return tuple(int(c * f) for c in rgb)


def _draw_shape(d: ImageDraw.ImageDraw, kind: str, rgb):
    c = S // 2
    if kind == "torso":
        d.rectangle([c - 55, c - 45, c + 55, c + 55], fill=rgb)
        d.rectangle([c - 80, c - 45, c - 55, c + 5], fill=rgb)
        d.rectangle([c + 55, c - 45, c + 80, c + 5], fill=rgb)
    elif kind == "torso_tall":
        d.rectangle([c - 50, c - 70, c + 50, c + 70], fill=rgb)
    elif kind == "legs":
        d.rectangle([c - 45, c - 70, c - 8, c + 75], fill=rgb)
        d.rectangle([c + 8, c - 70, c + 45, c + 75], fill=rgb)
    elif kind == "legs_thin":
        d.rectangle([c - 30, c - 75, c - 8, c + 80], fill=rgb)
        d.rectangle([c + 8, c - 75, c + 30, c + 80], fill=rgb)
    elif kind == "foot":
        d.ellipse([c - 70, c + 10, c + 70, c + 60], fill=rgb)
    elif kind == "foot_open":
        d.ellipse([c - 70, c + 10, c + 70, c + 60], outline=rgb, width=10)
    elif kind == "disc":
        d.ellipse([c - 40, c - 40, c + 40, c + 40], fill=rgb)
        d.rectangle([c - 12, c - 90, c + 12, c + 90], fill=_shade(rgb, 0.7))
    elif kind == "twin_disc":
        d.ellipse([c - 75, c - 25, c - 10, c + 25], fill=rgb)
        d.ellipse([c + 10, c - 25, c + 75, c + 25], fill=rgb)
    elif kind == "trapezoid":
        d.polygon([(c - 40, c - 65), (c + 40, c - 65), (c + 65, c + 65),
                   (c - 65, c + 65)], fill=rgb)
    elif kind == "bottle":
        d.rectangle([c - 30, c - 40, c + 30, c + 75], fill=rgb)
        d.rectangle([c - 12, c - 75, c + 12, c - 40], fill=_shade(rgb, 0.6))


def _apply_pattern(d: ImageDraw.ImageDraw, pattern: str, rgb):
    dark = _shade(rgb, 0.35)
    if pattern == "striped":
        for x in range(40, S - 40, 24):
            d.rectangle([x, 40, x + 6, S - 40], fill=dark)
    elif pattern == "dotted":
        for x in range(52, S - 40, 28):
            for y in range(52, S - 40, 28):
                d.ellipse([x, y, x + 9, y + 9], fill=dark)
    elif pattern == "checked":
        for x in range(40, S - 40, 26):
            d.rectangle([x, 40, x + 4, S - 40], fill=dark)
        for y in range(40, S - 40, 26):
            d.rectangle([40, y, S - 40, y + 4], fill=dark)


def render(colour, article, gender, pattern, trim) -> Image.Image:
    rgb = COLOURS[colour]
    kind, _, master = ARTICLES[article]
    img = Image.new("RGB", (S, S), (215, 215, 210))
    d = ImageDraw.Draw(img)
    _draw_shape(d, kind, rgb)
    _apply_pattern(d, pattern, rgb)
    # trim = horizontal band across the item in the accent colour
    d.rectangle([60, S // 2 - 6, S - 60, S // 2 + 6], fill=COLOURS[trim])
    # gender = frame colour
    d.rectangle([2, 2, S - 3, S - 3], outline=GENDERS[gender], width=6)
    # master category = filled corner marker
    q = MASTER_CORNER[master]
    cx = [(14, 14), (S - 44, 14), (14, S - 44), (S - 44, S - 44)][q]
    d.rectangle([cx[0], cx[1], cx[0] + 30, cx[1] + 30], fill=(10, 10, 10))
    return img


def caption(colour, article, gender, pattern, trim) -> str:
    _, sub, master = ARTICLES[article]
    display = f"{pattern} {colour} {article} with {trim} trim"
    return (
        f"{display}, {colour} {article} for {gender}, "
        f"category {master}/{sub}"
    )


def main():
    p = argparse.ArgumentParser(description="Generate synthetic fashion corpus")
    p.add_argument("--out", default="data/fashion_synth")
    p.add_argument("--n-train", type=int, default=2400)
    p.add_argument("--n-val", type=int, default=600)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    combos = [
        (c, a, g, pt, tr)
        for c in COLOURS
        for a in ARTICLES
        for g in GENDERS
        for pt in PATTERNS
        for tr in COLOURS
        if tr != c
    ]
    rng = random.Random(args.seed)
    rng.shuffle(combos)
    need = args.n_train + args.n_val
    if need > len(combos):
        raise SystemExit(f"need {need} combos, only {len(combos)} distinct exist")
    picked = combos[:need]

    img_dir = os.path.join(args.out, "images")
    os.makedirs(img_dir, exist_ok=True)
    with open(os.path.join(args.out, ".gitignore"), "w") as f:
        f.write("images/\n*.csv\n")

    rows = []
    for i, (c, a, g, pt, tr) in enumerate(picked):
        path = os.path.join(img_dir, f"{i:05d}.jpg")
        if not os.path.exists(path):
            render(c, a, g, pt, tr).save(path, quality=92)
        rows.append((path, caption(c, a, g, pt, tr)))

    def write_csv(name, subset):
        out = os.path.join(args.out, name)
        with open(out, "w") as f:
            f.write("image_path,text\n")
            for path, text in subset:
                f.write(f'{path},"{text}"\n')
        print(f"[corpus] wrote {out} ({len(subset)} rows)")

    write_csv("train_fashion_synth.csv", rows[: args.n_train])
    write_csv("val_fashion_synth.csv", rows[args.n_train :])


if __name__ == "__main__":
    main()
