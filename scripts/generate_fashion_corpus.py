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

``--detect`` mode renders a DETECTION corpus instead: the same article
shapes placed at random position/scale on varied backgrounds, with exact
ground-truth boxes (computed from the rendered alpha layer, not the
placement math — pixel-true) written to ``boxes_{split}.csv`` as
``image_path,x1 y1 x2 y2 cls[;...]``. This grounds the JAX YOLOv8 trainer
(models/yolo/train.py): the reference ships a pretrained ultralytics
yolov8s (ref:models/yolo_model.py:20-39) which zero egress forbids, so the
detector earns its weights from this programmatic ground truth.
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


# ---------------------------------------------------------------------------
# Detection corpus (--detect): random placement + pixel-true GT boxes
# ---------------------------------------------------------------------------

ARTICLE_CLASSES = sorted(ARTICLES)  # stable class-id ↔ article mapping


def render_object_layer(colour, article, pattern, trim) -> Image.Image:
    """The article shape alone on a transparent canvas, cropped to its own
    bounding box — the paste source for random placement."""
    rgb = COLOURS[colour]
    kind, _, _ = ARTICLES[article]
    layer = Image.new("RGBA", (S, S), (0, 0, 0, 0))
    d = ImageDraw.Draw(layer)
    _draw_shape(d, kind, rgb)
    # pattern/trim only where the shape is opaque (mask by current alpha)
    mask = layer.split()[3].copy()
    deco = Image.new("RGBA", (S, S), (0, 0, 0, 0))
    dd = ImageDraw.Draw(deco)
    _apply_pattern(dd, pattern, rgb)
    dd.rectangle([60, S // 2 - 6, S - 60, S // 2 + 6], fill=COLOURS[trim])
    layer.paste(deco, (0, 0), Image.composite(deco.split()[3], Image.new("L", (S, S), 0), mask))
    return layer.crop(layer.getbbox())


def render_detect_image(rng: random.Random, canvas: int, max_objects: int):
    """→ (PIL image, [(x1, y1, x2, y2, class_id), ...]). Ground truth is the
    pasted layer's alpha bbox — exact by construction."""
    bg = tuple(rng.randint(150, 235) for _ in range(3))
    img = Image.new("RGB", (canvas, canvas), bg)
    d = ImageDraw.Draw(img)
    # low-contrast clutter that is NOT an article (lines + outline boxes)
    for _ in range(rng.randint(0, 4)):
        shade = tuple(max(0, c - rng.randint(10, 35)) for c in bg)
        x1, y1 = rng.randint(0, canvas - 2), rng.randint(0, canvas - 2)
        x2, y2 = min(canvas, x1 + rng.randint(10, 80)), min(canvas, y1 + rng.randint(2, 10))
        if rng.random() < 0.5:
            d.rectangle([x1, y1, x2, y2], outline=shade, width=2)
        else:
            d.line([x1, y1, x2, y2], fill=shade, width=2)

    boxes = []
    n_obj = rng.randint(1, max_objects)
    for _ in range(n_obj):
        colour = rng.choice(list(COLOURS))
        article = rng.choice(ARTICLE_CLASSES)
        pattern = rng.choice(PATTERNS)
        trim = rng.choice([c for c in COLOURS if c != colour])
        layer = render_object_layer(colour, article, pattern, trim)
        # scale so the longer side lands in [0.2, 0.75] of the canvas
        target = rng.uniform(0.2, 0.75) * canvas
        f = target / max(layer.size)
        lw, lh = max(2, int(layer.size[0] * f)), max(2, int(layer.size[1] * f))
        layer = layer.resize((lw, lh), Image.Resampling.BILINEAR)
        placed = False
        for _attempt in range(20):
            px = rng.randint(0, canvas - lw)
            py = rng.randint(0, canvas - lh)
            cand = (px, py, px + lw, py + lh)
            overlap = any(
                not (cand[2] <= b[0] or b[2] <= cand[0]
                     or cand[3] <= b[1] or b[3] <= cand[1])
                for b in boxes
            )
            if not overlap:
                placed = True
                break
        if not placed:
            continue
        img.paste(layer, (px, py), layer)
        boxes.append((px, py, px + lw, py + lh,
                      ARTICLE_CLASSES.index(article)))
    return img, boxes


def generate_detect(args):
    rng = random.Random(args.seed)
    img_dir = os.path.join(args.out, "images")
    os.makedirs(img_dir, exist_ok=True)
    with open(os.path.join(args.out, ".gitignore"), "w") as f:
        f.write("images/\n*.csv\n")
    with open(os.path.join(args.out, "classes.txt"), "w") as f:
        f.write("\n".join(ARTICLE_CLASSES) + "\n")

    def write_split(name, n, start):
        csv_path = os.path.join(args.out, f"boxes_{name}.csv")
        with open(csv_path, "w") as f:
            f.write("image_path,boxes\n")
            for i in range(start, start + n):
                path = os.path.join(img_dir, f"{i:05d}.jpg")
                img, boxes = render_detect_image(rng, args.imgsz, args.max_objects)
                if not boxes:  # degenerate placement; retry deterministic-ish
                    img, boxes = render_detect_image(rng, args.imgsz, args.max_objects)
                img.save(path, quality=92)
                enc = ";".join(
                    f"{x1} {y1} {x2} {y2} {c}" for x1, y1, x2, y2, c in boxes
                )
                f.write(f'{path},"{enc}"\n')
        print(f"[corpus] wrote {csv_path} ({n} rows)")
        return start + n

    nxt = write_split("train", args.n_train, 0)
    write_split("val", args.n_val, nxt)


def main():
    p = argparse.ArgumentParser(description="Generate synthetic fashion corpus")
    p.add_argument("--out", default="data/fashion_synth")
    p.add_argument("--n-train", type=int, default=2400)
    p.add_argument("--n-val", type=int, default=600)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--detect", action="store_true",
                   help="generate a detection corpus with GT boxes instead")
    p.add_argument("--imgsz", type=int, default=320,
                   help="detection canvas size (multiple of 32)")
    p.add_argument("--max-objects", type=int, default=2)
    args = p.parse_args()

    if args.detect:
        generate_detect(args)
        return

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
