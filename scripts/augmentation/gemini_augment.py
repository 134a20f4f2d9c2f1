"""Gemini generative augmentation CLI (few-shot defect image generation).

Mirrors reference scripts/augmentation/gemini_augment.py: ``DEFECT_CONFIGS``
for casting_Inclusoes(50) / casting_Rechupe(50) / screw_defect(100)
(:42-157), few-shot contents = 1 normal ref + 1-2 cycled defect refs +
composed prompt base+key_instruction+variation[i%10]+style (:227-237,
:329-361), ``gemini-2.5-flash-image`` with temperature 0.3 and
response_modalities=["Image"] (:364-371), resumable progress JSON
{completed, failed, last_successful_index, start_time} (:161-181),
35s request pacing (:37, :427-430), retry x3 / 429 -> 600s backoff /
quota -> exit(1) (:399-419), ETA reporting (:304-323).

Differences by design: the API key comes from ``$GEMINI_API_KEY`` (the
reference hardcodes one in source — flagged in SURVEY.md as do-not-
reproduce), and ``--dry-run`` synthesizes placeholder images locally so the
downstream pipeline is testable without network/API access.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

REQUEST_INTERVAL_S = 35          # rate pacing (reference :37)
MODEL_NAME = "gemini-2.5-flash-image"

DEFECT_CONFIGS = {
    "casting_Inclusoes": {
        "count": 50,
        "reference_dir": "references/casting_inclusoes",
        "output_dir": "generated/casting_Inclusoes",
        "base_prompt": (
            "Generate a photorealistic industrial casting part image with "
            "an Inclusoes defect (foreign-material inclusion visible as a "
            "dark irregular spot embedded in the metal surface)."),
        "key_instruction": (
            "Keep the part geometry, lighting and camera angle consistent "
            "with the reference images; only the defect placement and "
            "shape should vary."),
    },
    "casting_Rechupe": {
        "count": 50,
        "reference_dir": "references/casting_rechupe",
        "output_dir": "generated/casting_Rechupe",
        "base_prompt": (
            "Generate a photorealistic industrial casting part image with "
            "a Rechupe defect (shrinkage cavity: a sunken, porous area in "
            "the cast surface)."),
        "key_instruction": (
            "Match the reference part and illumination; vary only the "
            "cavity location, depth appearance and extent."),
    },
    "screw_defect": {
        "count": 100,
        "reference_dir": "references/screw",
        "output_dir": "generated/screw_defect",
        "base_prompt": (
            "Generate a photorealistic image of a machine screw with a "
            "surface defect (thread damage, dent or scratch)."),
        "key_instruction": (
            "Preserve screw type, scale and background from the "
            "references; vary defect type and position."),
    },
}

VARIATIONS = [
    "Place the defect near the center of the part.",
    "Place the defect close to the upper edge.",
    "Place the defect close to the lower edge.",
    "Place the defect on the left side.",
    "Place the defect on the right side.",
    "Make the defect small and subtle.",
    "Make the defect large and prominent.",
    "Use two small defects close together.",
    "Make the defect elongated along the surface.",
    "Make the defect roughly circular.",
]

STYLE = ("Industrial inspection photo, sharp focus, neutral lighting, "
         "no text or watermarks.")


def generate_prompt(config: dict, i: int) -> str:
    """4-part prompt: base + key instruction + variation(i%10) + style."""
    return "\n".join([config["base_prompt"], config["key_instruction"],
                      VARIATIONS[i % len(VARIATIONS)], STYLE])


def load_progress(path: Path) -> dict:
    if path.exists():
        with open(path) as f:
            return json.load(f)
    return {"completed": [], "failed": [],
            "last_successful_index": -1, "start_time": time.time()}


def save_progress(path: Path, progress: dict):
    with open(path, "w") as f:
        json.dump(progress, f, indent=2)


def load_reference_images(ref_dir: Path):
    """First file (sorted) = normal reference, rest = defect references."""
    from PIL import Image

    files = sorted(p for p in ref_dir.iterdir()
                   if p.suffix.lower() in (".jpg", ".jpeg", ".png"))
    if len(files) < 2:
        raise FileNotFoundError(
            f"need >=2 reference images in {ref_dir} "
            "(first = normal, rest = defect examples)")
    images = [Image.open(p).convert("RGB") for p in files]
    return images[0], images[1:]


def _dry_run_generate(config: dict, i: int, rng):
    """Synthesize a placeholder defect image (no API)."""
    import numpy as np
    from PIL import Image, ImageDraw

    img = Image.new("RGB", (512, 512),
                    tuple(int(v) for v in rng.integers(90, 130, 3)))
    d = ImageDraw.Draw(img)
    cx, cy = rng.integers(100, 412, 2)
    r = int(rng.integers(10, 60))
    d.ellipse([cx - r, cy - r, cx + r, cy + r],
              fill=tuple(int(v) for v in rng.integers(20, 60, 3)))
    return img


def run_generation(defect_type: str, count: int = None, root: Path = None,
                   dry_run: bool = False) -> int:
    config = DEFECT_CONFIGS[defect_type]
    total = count or config["count"]
    root = root or Path(".")
    out_dir = root / config["output_dir"]
    out_dir.mkdir(parents=True, exist_ok=True)
    progress_path = out_dir / "progress.json"
    progress = load_progress(progress_path)
    start = progress["last_successful_index"] + 1
    if start >= total:
        print(f"{defect_type}: already complete ({total} images)")
        return 0

    client = None
    normal_ref, defect_refs = None, []
    if not dry_run:
        api_key = os.environ.get("GEMINI_API_KEY")
        if not api_key:
            sys.exit("set $GEMINI_API_KEY (or use --dry-run)")
        try:
            from google import genai
            from google.genai import types
        except ImportError:
            sys.exit("google-genai SDK not installed (use --dry-run)")
        client = genai.Client(api_key=api_key)
        normal_ref, defect_refs = load_reference_images(
            root / config["reference_dir"])

    import numpy as np

    rng = np.random.default_rng(0)
    t_loop = time.time()
    done_this_run = 0
    for i in range(start, total):
        t_iter = time.time()
        prompt = generate_prompt(config, i)
        out_path = out_dir / f"{defect_type}_{i:03d}.png"
        try:
            if dry_run:
                img = _dry_run_generate(config, i, rng)
                img.save(out_path)
            else:
                from google.genai import types

                contents = [normal_ref,
                            defect_refs[i % len(defect_refs)]]
                if len(defect_refs) > 1:
                    contents.append(defect_refs[(i + 1) % len(defect_refs)])
                contents.append(prompt)
                for attempt in range(3):           # retry ladder (:399-419)
                    try:
                        resp = client.models.generate_content(
                            model=MODEL_NAME, contents=contents,
                            config=types.GenerateContentConfig(
                                temperature=0.3,
                                response_modalities=["Image"]))
                        part = resp.candidates[0].content.parts[0]
                        with open(out_path, "wb") as f:
                            f.write(part.inline_data.data)
                        break
                    except Exception as e:
                        msg = str(e)
                        if "429" in msg or "RESOURCE_EXHAUSTED" in msg:
                            if "quota" in msg.lower():
                                print("daily quota exhausted; exiting")
                                save_progress(progress_path, progress)
                                sys.exit(1)
                            print("rate limited; sleeping 600s")
                            time.sleep(600)
                        elif attempt == 2:
                            raise
                        else:
                            time.sleep(5 * (attempt + 1))
            progress["completed"].append(out_path.name)
            progress["last_successful_index"] = i
            save_progress(progress_path, progress)
            done_this_run += 1
        except SystemExit:
            raise
        except Exception as e:
            print(f"  [{i}] failed: {e}")
            progress["failed"].append({"index": i, "error": str(e)})
            save_progress(progress_path, progress)

        done = i - start + 1
        rate = (time.time() - t_loop) / done
        eta = rate * (total - i - 1)
        print(f"  [{i + 1}/{total}] {out_path.name} "
              f"({time.time() - t_iter:.1f}s, ETA {eta / 60:.1f}min)")
        if not dry_run and i < total - 1:
            wait = REQUEST_INTERVAL_S - (time.time() - t_iter)
            if wait > 0:
                time.sleep(wait)
    print(f"{defect_type}: generated {done_this_run} images -> {out_dir}")
    return done_this_run


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("defect_type",
                    choices=list(DEFECT_CONFIGS) + ["all"])
    ap.add_argument("--count", type=int, default=None,
                    help="override image count (e.g. 10 for a test run)")
    ap.add_argument("--root", default=".", help="reference/output root")
    ap.add_argument("--dry-run", action="store_true",
                    help="synthesize placeholders locally (no API)")
    args = ap.parse_args()

    targets = (list(DEFECT_CONFIGS) if args.defect_type == "all"
               else [args.defect_type])
    for t in targets:
        run_generation(t, args.count, Path(args.root), args.dry_run)


if __name__ == "__main__":
    main()
