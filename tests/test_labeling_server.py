"""HTTP-level tests of the labeling server WSGI app (no network).

Covers the reference API surface (SURVEY.md L4): /info, /images/list,
/images/serve, /annotations/for, /stats, /save (multipart), /save/existing,
/ai/segment, /delete — plus backup-on-save and gen_ai delete protection.
"""

import io
import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]
                       / "labeling_server"))

from app import CATEGORY_CLASSES, LabelingApp  # noqa: E402


def call(app, method, path, body=b"", content_type="application/json"):
    out = {}
    environ = {
        "REQUEST_METHOD": method, "PATH_INFO": path, "QUERY_STRING": "",
        "CONTENT_LENGTH": str(len(body)), "CONTENT_TYPE": content_type,
        "wsgi.input": io.BytesIO(body),
    }

    def start_response(status, headers):
        out["status"] = status
        out["headers"] = dict(headers)

    chunks = app(environ, start_response)
    out["body"] = b"".join(chunks)
    if out["headers"].get("Content-Type", "").startswith("application/json"):
        out["json"] = json.loads(out["body"])
    return out


def jpost(app, path, obj):
    return call(app, "POST", path, json.dumps(obj).encode())


def make_jpg_bytes(w=32, h=24, value=128):
    from PIL import Image

    arr = np.full((h, w, 3), value, np.uint8)
    arr[8:16, 8:24] = 250
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


def multipart_body(fields):
    boundary = b"testboundary123"
    parts = []
    for name, (filename, data) in fields.items():
        head = f'Content-Disposition: form-data; name="{name}"'
        if filename:
            head += f'; filename="{filename}"'
        parts.append(b"--" + boundary + b"\r\n" + head.encode()
                     + b"\r\n\r\n" + data + b"\r\n")
    body = b"".join(parts) + b"--" + boundary + b"--\r\n"
    return body, f"multipart/form-data; boundary={boundary.decode()}"


@pytest.fixture()
def app(tmp_path):
    return LabelingApp("Cable", "train", str(tmp_path))


class TestBasicRoutes:
    def test_info(self, app):
        r = call(app, "GET", "/info")
        assert r["status"].startswith("200")
        assert r["json"]["category"] == "Cable"
        assert r["json"]["classes"] == {"thunderbolt": 1}

    def test_index_serves_ui(self, app):
        r = call(app, "GET", "/")
        assert r["status"].startswith("200")
        assert b"<canvas" in r["body"]
        assert b"__SERVER_CONFIG__" not in r["body"]  # substituted
        assert b"thunderbolt" in r["body"]

    def test_404(self, app):
        r = call(app, "GET", "/nope")
        assert r["status"].startswith("404")

    def test_stats_empty(self, app):
        r = call(app, "GET", "/stats")
        assert r["json"]["num_images"] == 0
        assert r["json"]["per_class"] == {"thunderbolt": 0}


class TestSaveFlow:
    def test_upload_allocates_filename(self, app):
        body, ctype = multipart_body({
            "image": ("up.jpg", make_jpg_bytes()),
            "annotations": (None, json.dumps([
                {"category_id": 1, "bbox": [1, 2, 10, 8],
                 "segmentation": [[1, 2, 11, 2, 11, 10, 1, 10]],
                 "area": 80}]).encode()),
        })
        r = call(app, "POST", "/save", body, ctype)
        assert r["json"]["status"] == "ok"
        assert r["json"]["filename"] == "Cable_000000.jpg"
        assert (app.image_dir / "Cable_000000.jpg").exists()

        # second upload gets the next number
        body, ctype = multipart_body({
            "image": ("up2.jpg", make_jpg_bytes()),
            "annotations": (None, b"[]"),
        })
        r2 = call(app, "POST", "/save", body, ctype)
        assert r2["json"]["filename"] == "Cable_000001.jpg"

    def test_save_existing_replaces(self, app):
        body, ctype = multipart_body({
            "image": ("x.jpg", make_jpg_bytes()),
            "annotations": (None, json.dumps([
                {"category_id": 1, "bbox": [0, 0, 5, 5],
                 "segmentation": [[0, 0, 5, 0, 5, 5]], "area": 12.5}]).encode()),
        })
        fname = call(app, "POST", "/save", body, ctype)["json"]["filename"]

        r = jpost(app, "/save/existing", {
            "filename": fname,
            "annotations": [
                {"category_id": 1, "bbox": [2, 2, 6, 6],
                 "segmentation": [[2, 2, 8, 2, 8, 8]], "area": 18},
                {"category_id": 1, "bbox": [10, 10, 4, 4],
                 "segmentation": [[10, 10, 14, 10, 14, 14]], "area": 8}],
        })
        assert r["json"]["status"] == "ok"
        anns = call(app, "GET", f"/annotations/for/{fname}")["json"]
        assert len(anns["annotations"]) == 2   # replaced, not appended

    def test_backup_created_on_save(self, app):
        body, ctype = multipart_body({
            "image": ("x.jpg", make_jpg_bytes()),
            "annotations": (None, b"[]")})
        call(app, "POST", "/save", body, ctype)
        backups = list(app.base_dir.glob("annotations_backup_*.json"))
        assert len(backups) >= 1

    def test_annotations_for_unknown(self, app):
        r = call(app, "GET", "/annotations/for/ghost.jpg")
        assert r["json"]["image"] is None


class TestAISegment:
    def test_fallback_polygon(self, app):
        import base64

        from PIL import Image

        arr = np.full((64, 64, 3), 30, np.uint8)
        arr[20:44, 20:44] = 240                 # bright defect blob
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        r = jpost(app, "/ai/segment", {"image_data": f"data:image/png;base64,{b64}"})
        assert r["json"]["status"] == "ok"
        poly = r["json"]["polygon"]
        assert len(poly) >= 6
        xs, ys = poly[0::2], poly[1::2]
        assert 15 <= min(xs) <= 25 and 38 <= max(xs) <= 48


class TestDelete:
    def _upload(self, app):
        body, ctype = multipart_body({
            "image": ("x.jpg", make_jpg_bytes()),
            "annotations": (None, json.dumps([
                {"category_id": 1, "bbox": [0, 0, 5, 5],
                 "segmentation": [], "area": 25}]).encode())})
        return call(app, "POST", "/save", body, ctype)["json"]["filename"]

    def test_delete_removes_file_and_anns(self, app):
        fname = self._upload(app)
        r = jpost(app, "/delete", {"filename": fname})
        assert r["json"]["status"] == "ok"
        assert r["json"]["file_deleted"] is True
        assert not (app.image_dir / fname).exists()
        assert call(app, "GET", "/stats")["json"]["num_annotations"] == 0

    def test_gen_ai_files_protected(self, tmp_path):
        app = LabelingApp("Cable", "gen_ai", str(tmp_path))
        fname = self._upload(app)
        r = jpost(app, "/delete", {"filename": fname})
        assert r["json"]["status"] == "ok"
        assert r["json"]["file_deleted"] is False
        assert (app.image_dir / fname).exists()  # file kept


class TestCategoryTables:
    def test_reference_class_tables(self):
        # reference app.py:28-35
        assert CATEGORY_CLASSES["Cable"] == {"thunderbolt": 1}
        assert CATEGORY_CLASSES["Screw"] == {"defect": 1}
        assert CATEGORY_CLASSES["Casting"] == {"Inclusoes": 1, "Rechupe": 2}
