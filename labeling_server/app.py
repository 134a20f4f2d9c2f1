"""COCO annotation labeling server (stdlib WSGI, no external deps).

HTTP-API-compatible rebuild of the reference Flask server
(labeling_server/app.py): same routes — ``GET /``, ``/info``,
``/images/list``, ``/images/serve/<f>``, ``/annotations/for/<f>``,
``/stats``; ``POST /save`` (multipart), ``/save/existing`` (JSON),
``/ai/segment``, ``/delete`` (app.py:120-394) — same category/class tables
(:28-35), timestamped JSON backups on every save (:92-102), next-id
allocation (:105-108), ``{Domain}_NNNNNN.jpg`` filename allocation
(:210-222), and gen_ai images protected from file deletion (:361-364).

Differences by design: Flask is replaced by a stdlib WSGI router (Flask is
not in this image and the server is a thin IO layer), and annotation writes
go through a file lock + atomic rename (the reference's unlocked
last-writer-wins JSON write is a known race, SURVEY.md §5).
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import mimetypes
import os
import re
import shutil
import threading
import time
from datetime import datetime
from pathlib import Path
from typing import Callable, Dict, List, Optional, Tuple
from urllib.parse import parse_qs

import numpy as np

# category -> {class_name: class_id} (reference app.py:28-35; note Casting
# uses 1/2 here while guide.md:311-317 trains with 0/1 — a real reference
# inconsistency, preserved at the labeling layer and normalized at train
# time by fix_category_ids / the dataset loader)
CATEGORY_CLASSES = {
    "Cable": {"thunderbolt": 1},
    "Screw": {"defect": 1},
    "Casting": {"Inclusoes": 1, "Rechupe": 2},
}


class FallbackSegmentation:
    """Classical-CV segmentation inside a bbox crop: Otsu -> morphology ->
    largest contour -> approxPolyDP (reference app.py:57-74)."""

    def predict(self, image_rgb: np.ndarray) -> Optional[List[float]]:
        import cv2

        gray = cv2.cvtColor(image_rgb, cv2.COLOR_RGB2GRAY)
        _, th = cv2.threshold(gray, 0, 255,
                              cv2.THRESH_BINARY + cv2.THRESH_OTSU)
        # pick the polarity with less area (defects are small)
        if (th > 0).mean() > 0.5:
            th = 255 - th
        kernel = np.ones((3, 3), np.uint8)
        th = cv2.morphologyEx(th, cv2.MORPH_CLOSE, kernel)
        th = cv2.morphologyEx(th, cv2.MORPH_OPEN, kernel)
        contours, _ = cv2.findContours(th, cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
        if not contours:
            return None
        c = max(contours, key=cv2.contourArea)
        if cv2.contourArea(c) < 10:
            return None
        eps = 0.005 * cv2.arcLength(c, True)
        poly = cv2.approxPolyDP(c, eps, True).reshape(-1, 2)
        if len(poly) < 3:
            return None
        return [float(v) for xy in poly for v in xy]


class AnnotationStore:
    """Locked, atomic COCO-JSON store with timestamped backups."""

    def __init__(self, ann_file: Path, classes: Dict[str, int]):
        self.ann_file = Path(ann_file)
        self.lock = threading.Lock()
        self.classes = classes
        if self.ann_file.exists():
            with open(self.ann_file) as f:
                self.data = json.load(f)
        else:
            self.data = {
                "images": [], "annotations": [],
                "categories": [{"id": cid, "name": name,
                                "supercategory": "defect"}
                               for name, cid in classes.items()],
            }
            self.ann_file.parent.mkdir(parents=True, exist_ok=True)
            self._write()

    def _write(self):
        tmp = self.ann_file.with_suffix(".json.tmp")
        with open(tmp, "w") as f:
            json.dump(self.data, f, ensure_ascii=False, indent=2)
        os.replace(tmp, self.ann_file)

    def save(self):
        """Timestamped backup + atomic rewrite (reference app.py:92-102)."""
        with self.lock:
            if self.ann_file.exists():
                stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
                backup = self.ann_file.with_name(
                    f"{self.ann_file.stem}_backup_{stamp}.json")
                shutil.copy2(self.ann_file, backup)
            self._write()

    def next_ids(self) -> Tuple[int, int]:
        """(next_image_id, next_annotation_id) (reference app.py:105-108)."""
        img_id = max((im["id"] for im in self.data["images"]), default=0) + 1
        ann_id = max((a["id"] for a in self.data["annotations"]),
                     default=0) + 1
        return img_id, ann_id

    def image_by_name(self, file_name: str) -> Optional[dict]:
        for im in self.data["images"]:
            if im["file_name"] == file_name:
                return im
        return None

    def annotations_for(self, image_id: int) -> List[dict]:
        return [a for a in self.data["annotations"]
                if a["image_id"] == image_id]


# ------------------------------------------------------------------ WSGI
class Request:
    def __init__(self, environ):
        self.environ = environ
        self.method = environ["REQUEST_METHOD"]
        self.path = environ["PATH_INFO"]
        self.query = parse_qs(environ.get("QUERY_STRING", ""))
        self._body = None

    @property
    def body(self) -> bytes:
        if self._body is None:
            length = int(self.environ.get("CONTENT_LENGTH") or 0)
            self._body = self.environ["wsgi.input"].read(length)
        return self._body

    def json(self):
        return json.loads(self.body.decode("utf-8"))

    def multipart(self) -> Dict[str, dict]:
        """Minimal multipart/form-data parser -> {name: {filename, data}}."""
        ctype = self.environ.get("CONTENT_TYPE", "")
        m = re.search(r'boundary="?([^";]+)"?', ctype)
        if not m:
            raise ValueError("no multipart boundary")
        boundary = m.group(1).encode()
        parts: Dict[str, dict] = {}
        for chunk in self.body.split(b"--" + boundary):
            chunk = chunk.strip(b"\r\n")
            if not chunk or chunk == b"--":
                continue
            if b"\r\n\r\n" not in chunk:
                continue
            header_blob, data = chunk.split(b"\r\n\r\n", 1)
            headers = header_blob.decode("utf-8", "replace")
            nm = re.search(r'name="([^"]+)"', headers)
            fn = re.search(r'filename="([^"]*)"', headers)
            if nm:
                parts[nm.group(1)] = {
                    "filename": fn.group(1) if fn else None,
                    "data": data,
                }
        return parts


class LabelingApp:
    """The WSGI application: routing + handlers."""

    def __init__(self, category: str, split: str, data_root: str,
                 ai_model=None):
        if category not in CATEGORY_CLASSES:
            raise ValueError(f"unknown category {category!r}; "
                             f"choose from {list(CATEGORY_CLASSES)}")
        self.category = category
        self.split = split
        self.classes = CATEGORY_CLASSES[category]
        self.base_dir = Path(data_root) / category / split
        self.image_dir = self.base_dir / "images"
        self.image_dir.mkdir(parents=True, exist_ok=True)
        self.store = AnnotationStore(self.base_dir / "annotations.json",
                                     self.classes)
        self.fallback = FallbackSegmentation()
        self.ai_model = ai_model
        self.started = time.time()
        self.routes: List[Tuple[str, re.Pattern, Callable]] = []
        self._register_routes()

    # ------------------------------------------------------------- routing
    def route(self, method: str, pattern: str):
        compiled = re.compile("^" + pattern + "$")

        def deco(fn):
            self.routes.append((method, compiled, fn))
            return fn

        return deco

    def _register_routes(self):
        r = self.route
        r("GET", r"/")(self.index)
        r("GET", r"/info")(self.info)
        r("GET", r"/images/list")(self.images_list)
        r("GET", r"/images/serve/(?P<fname>[^/]+)")(self.images_serve)
        r("GET", r"/annotations/for/(?P<fname>[^/]+)")(self.annotations_for)
        r("GET", r"/stats")(self.stats)
        r("POST", r"/save")(self.save_upload)
        r("POST", r"/save/existing")(self.save_existing)
        r("POST", r"/ai/segment")(self.ai_segment)
        r("POST", r"/delete")(self.delete)

    def __call__(self, environ, start_response):
        req = Request(environ)
        for method, pattern, handler in self.routes:
            m = pattern.match(req.path)
            if m and req.method == method:
                try:
                    status, headers, body = handler(req, **m.groupdict())
                except Exception as e:  # pragma: no cover
                    import traceback
                    traceback.print_exc()
                    status, headers, body = self._json_resp(
                        {"error": str(e)}, 500)
                start_response(status, headers)
                return [body]
        start_response("404 NOT FOUND",
                       [("Content-Type", "application/json")])
        return [json.dumps({"error": "not found"}).encode()]

    @staticmethod
    def _json_resp(obj, code: int = 200):
        statuses = {200: "200 OK", 400: "400 BAD REQUEST",
                    404: "404 NOT FOUND", 500: "500 INTERNAL SERVER ERROR"}
        body = json.dumps(obj, ensure_ascii=False).encode("utf-8")
        return (statuses[code],
                [("Content-Type", "application/json; charset=utf-8"),
                 ("Content-Length", str(len(body)))], body)

    # ------------------------------------------------------------ handlers
    def index(self, req):
        tpl = Path(__file__).parent / "templates" / "annotation_template.html"
        html = tpl.read_text(encoding="utf-8")
        cfg = json.dumps({"category": self.category, "split": self.split,
                          "classes": self.classes})
        html = html.replace("__SERVER_CONFIG__", cfg)
        body = html.encode("utf-8")
        return ("200 OK", [("Content-Type", "text/html; charset=utf-8"),
                           ("Content-Length", str(len(body)))], body)

    def info(self, req):
        return self._json_resp({
            "category": self.category,
            "split": self.split,
            "classes": self.classes,
            "num_images": len(self.store.data["images"]),
            "num_annotations": len(self.store.data["annotations"]),
            "image_dir": str(self.image_dir),
        })

    def images_list(self, req):
        files = sorted(p.name for p in self.image_dir.iterdir()
                       if p.suffix.lower() in (".jpg", ".jpeg", ".png"))
        annotated = {im["file_name"] for im in self.store.data["images"]
                     if self.store.annotations_for(im["id"])}
        return self._json_resp({
            "images": [{"filename": f, "annotated": f in annotated}
                       for f in files],
            "total": len(files),
        })

    def images_serve(self, req, fname: str):
        path = self.image_dir / os.path.basename(fname)
        if not path.exists():
            return self._json_resp({"error": "image not found"}, 404)
        ctype = mimetypes.guess_type(str(path))[0] or "image/jpeg"
        data = path.read_bytes()
        return ("200 OK", [("Content-Type", ctype),
                           ("Content-Length", str(len(data)))], data)

    def annotations_for(self, req, fname: str):
        im = self.store.image_by_name(os.path.basename(fname))
        if im is None:
            return self._json_resp({"image": None, "annotations": []})
        return self._json_resp({
            "image": im,
            "annotations": self.store.annotations_for(im["id"]),
        })

    def stats(self, req):
        per_class: Dict[str, int] = {n: 0 for n in self.classes}
        id2name = {cid: n for n, cid in self.classes.items()}
        for a in self.store.data["annotations"]:
            name = id2name.get(a["category_id"])
            if name:
                per_class[name] += 1
        return self._json_resp({
            "num_images": len(self.store.data["images"]),
            "num_annotations": len(self.store.data["annotations"]),
            "per_class": per_class,
            "uptime_s": round(time.time() - self.started, 1),
        })

    def _allocate_filename(self) -> str:
        """{Category}_NNNNNN.jpg with the next free number (ref :210-222)."""
        pat = re.compile(rf"{self.category}_(\d{{6}})\.jpg")
        used = set()
        for p in self.image_dir.iterdir():
            m = pat.fullmatch(p.name)
            if m:
                used.add(int(m.group(1)))
        n = 0
        while n in used:
            n += 1
        return f"{self.category}_{n:06d}.jpg"

    def save_upload(self, req):
        """Multipart: image file + annotations JSON (reference :197-259)."""
        parts = req.multipart()
        if "image" not in parts or "annotations" not in parts:
            return self._json_resp(
                {"error": "need 'image' file and 'annotations' field"}, 400)
        from PIL import Image

        img = Image.open(io.BytesIO(parts["image"]["data"])).convert("RGB")
        fname = self._allocate_filename()
        img.save(self.image_dir / fname, quality=95)

        anns = json.loads(parts["annotations"]["data"].decode("utf-8"))
        img_id, ann_id = self.store.next_ids()
        self.store.data["images"].append({
            "id": img_id, "file_name": fname,
            "width": img.width, "height": img.height,
        })
        saved = []
        for a in anns:
            rec = {"id": ann_id, "image_id": img_id,
                   "category_id": int(a["category_id"]),
                   "bbox": [float(v) for v in a["bbox"]],
                   "segmentation": a.get("segmentation", []),
                   "area": float(a.get("area") or
                                 a["bbox"][2] * a["bbox"][3]),
                   "iscrowd": 0}
            self.store.data["annotations"].append(rec)
            saved.append(ann_id)
            ann_id += 1
        self.store.save()
        return self._json_resp({"status": "ok", "filename": fname,
                                "image_id": img_id,
                                "annotation_ids": saved})

    def save_existing(self, req):
        """JSON: replace annotations of an existing image by image_id
        (reference :262-322 replace-by-image_id semantics)."""
        payload = req.json()
        fname = os.path.basename(payload.get("filename", ""))
        im = self.store.image_by_name(fname)
        if im is None:
            # register the image record on first save
            from PIL import Image

            path = self.image_dir / fname
            if not path.exists():
                return self._json_resp({"error": "image not found"}, 404)
            with Image.open(path) as pil:
                w, h = pil.size
            img_id, _ = self.store.next_ids()
            im = {"id": img_id, "file_name": fname, "width": w, "height": h}
            self.store.data["images"].append(im)
        self.store.data["annotations"] = [
            a for a in self.store.data["annotations"]
            if a["image_id"] != im["id"]]
        _, ann_id = self.store.next_ids()
        saved = []
        for a in payload.get("annotations", []):
            rec = {"id": ann_id, "image_id": im["id"],
                   "category_id": int(a["category_id"]),
                   "bbox": [float(v) for v in a["bbox"]],
                   "segmentation": a.get("segmentation", []),
                   "area": float(a.get("area") or
                                 a["bbox"][2] * a["bbox"][3]),
                   "iscrowd": 0}
            self.store.data["annotations"].append(rec)
            saved.append(ann_id)
            ann_id += 1
        self.store.save()
        return self._json_resp({"status": "ok", "image_id": im["id"],
                                "annotation_ids": saved})

    def ai_segment(self, req):
        """b64 crop -> polygon in crop coordinates (reference :325-338)."""
        payload = req.json()
        b64 = payload.get("image_data", "")
        if "," in b64:
            b64 = b64.split(",", 1)[1]
        from PIL import Image

        img = np.asarray(Image.open(
            io.BytesIO(base64.b64decode(b64))).convert("RGB"))
        polygon = None
        if self.ai_model is not None:
            try:
                polygon = self.ai_model.predict_polygon(img)
            except Exception:
                polygon = None
        if polygon is None:
            polygon = self.fallback.predict(img)
        if polygon is None:
            return self._json_resp({"status": "no_object",
                                    "polygon": None})
        return self._json_resp({"status": "ok", "polygon": polygon})

    def delete(self, req):
        """Delete image record + annotations; gen_ai image FILES are kept
        (reference :361-364)."""
        payload = req.json()
        fname = os.path.basename(payload.get("filename", ""))
        im = self.store.image_by_name(fname)
        if im is None:
            return self._json_resp({"error": "image not found"}, 404)
        n_anns = len(self.store.annotations_for(im["id"]))
        self.store.data["images"] = [
            i for i in self.store.data["images"] if i["id"] != im["id"]]
        self.store.data["annotations"] = [
            a for a in self.store.data["annotations"]
            if a["image_id"] != im["id"]]
        file_deleted = False
        if self.split != "gen_ai":  # gen_ai files protected
            path = self.image_dir / fname
            if path.exists():
                path.unlink()
                file_deleted = True
        self.store.save()
        return self._json_resp({"status": "ok",
                                "removed_annotations": n_anns,
                                "file_deleted": file_deleted})


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--category", required=True,
                    choices=list(CATEGORY_CLASSES))
    ap.add_argument("--split", default="train",
                    help="train | val | gen_ai | traditional_aug")
    ap.add_argument("--data-root", default=os.environ.get(
        "VIST_DATA_ROOT", "./data"))
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=5000)
    ap.add_argument("--model-checkpoint", default=None,
                    help="optional JAX checkpoint for AI-assisted segment")
    args = ap.parse_args()

    ai_model = None
    if args.model_checkpoint:
        import sys
        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        from ai_segmentation import AISegmentationModel

        ai_model = AISegmentationModel(args.model_checkpoint)

    app = LabelingApp(args.category, args.split, args.data_root, ai_model)
    from wsgiref.simple_server import make_server

    print(f"labeling server: category={args.category} split={args.split}")
    print(f"  images: {app.image_dir}")
    print(f"  serving on http://{args.host}:{args.port}")
    make_server(args.host, args.port, app).serve_forever()


if __name__ == "__main__":
    main()
