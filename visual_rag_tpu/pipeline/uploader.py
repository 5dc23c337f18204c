"""Page-image upload: Cloudinary CDN (gated) or a local image store.

Reference: visual_rag/indexing/cloudinary_uploader.py:35-274 — JPEG-optimized
uploads with retry x3 and a per-upload timeout that is SIGALRM-based on the
main thread and ThreadPoolExecutor-based in threaded contexts
(VISUAL_RAG_THREAD_SAFE). Here the timeout is always executor-based (no
signal juggling), and a :class:`LocalImageStore` drop-in exists for
credential-less deployments: it writes JPEGs under a directory and returns
file:// URLs with the same original/cropped/resized sub-folder scheme.
"""

from __future__ import annotations

import concurrent.futures
import logging
import time
from pathlib import Path
from typing import Any, Dict, Optional

logger = logging.getLogger(__name__)


class LocalImageStore:
    """Filesystem-backed stand-in for the CDN uploader (same API surface)."""

    def __init__(self, root: str = "image_store", quality: int = 85):
        self.root = Path(root)
        self.quality = int(quality)

    def _save(self, image, folder: str, public_id: str) -> Dict[str, Any]:
        try:
            from PIL import Image
        except ImportError as exc:
            raise ImportError("LocalImageStore requires Pillow") from exc
        import numpy as np

        path = self.root / folder / f"{public_id}.jpg"
        path.parent.mkdir(parents=True, exist_ok=True)
        if not hasattr(image, "save"):
            arr = np.asarray(image)
            if arr.max() <= 1.5:
                arr = arr * 255
            image = Image.fromarray(arr.astype("uint8"))
        image.convert("RGB").save(path, "JPEG", quality=self.quality)
        return {"url": path.resolve().as_uri(), "public_id": public_id,
                "bytes": path.stat().st_size}

    def upload_image(self, image, public_id: str, folder: str = "pages") -> Dict[str, Any]:
        return self._save(image, folder, public_id)

    def upload_original_and_resized(self, original, resized, public_id: str,
                                    folder: str = "pages") -> Dict[str, Any]:
        return {
            "original": self._save(original, f"{folder}/original", public_id),
            "resized": self._save(resized, f"{folder}/resized", public_id),
        }

    def upload_original_cropped_and_resized(self, original, cropped, resized,
                                            public_id: str,
                                            folder: str = "pages") -> Dict[str, Any]:
        return {
            "original": self._save(original, f"{folder}/original", public_id),
            "cropped": self._save(cropped, f"{folder}/cropped", public_id),
            "resized": self._save(resized, f"{folder}/resized", public_id),
        }


class CloudinaryUploader:
    """CDN uploader with retry + executor-based timeouts (credentials gated)."""

    def __init__(self, cloud_name: Optional[str] = None,
                 api_key: Optional[str] = None, api_secret: Optional[str] = None,
                 timeout: float = 30.0, max_retries: int = 3,
                 retry_sleep: float = 1.0, quality: int = 85):
        try:
            import cloudinary
        except ImportError as exc:
            raise ImportError(
                "CloudinaryUploader requires the cloudinary SDK; "
                "use LocalImageStore for a dependency-free image store"
            ) from exc
        import os

        cloudinary.config(
            cloud_name=cloud_name or os.environ.get("CLOUDINARY_CLOUD_NAME"),
            api_key=api_key or os.environ.get("CLOUDINARY_API_KEY"),
            api_secret=api_secret or os.environ.get("CLOUDINARY_API_SECRET"),
        )
        self.timeout = float(timeout)
        self.max_retries = int(max_retries)
        self.retry_sleep = float(retry_sleep)
        self.quality = int(quality)
        self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=2)

    def _upload_once(self, image, public_id: str, folder: str) -> Dict[str, Any]:
        import io

        import cloudinary.uploader

        buf = io.BytesIO()
        image.convert("RGB").save(buf, "JPEG", quality=self.quality)
        buf.seek(0)
        res = cloudinary.uploader.upload(
            buf, public_id=public_id, folder=folder, resource_type="image")
        return {"url": res.get("secure_url") or res.get("url"),
                "public_id": res.get("public_id"), "bytes": res.get("bytes")}

    def upload_image(self, image, public_id: str, folder: str = "pages") -> Dict[str, Any]:
        last: Optional[Exception] = None
        for attempt in range(self.max_retries):
            future = self._pool.submit(self._upload_once, image, public_id, folder)
            try:
                return future.result(timeout=self.timeout)
            except Exception as exc:  # timeout or API error -> retry w/ backoff
                last = exc
                future.cancel()
                sleep = self.retry_sleep * (2 ** attempt)
                logger.warning("upload %s failed (%s); retry in %.1fs",
                               public_id, exc, sleep)
                time.sleep(sleep)
        raise RuntimeError(f"upload failed after {self.max_retries} tries: {last}")

    def upload_original_and_resized(self, original, resized, public_id: str,
                                    folder: str = "pages") -> Dict[str, Any]:
        return {
            "original": self.upload_image(original, public_id, f"{folder}/original"),
            "resized": self.upload_image(resized, public_id, f"{folder}/resized"),
        }

    def upload_original_cropped_and_resized(self, original, cropped, resized,
                                            public_id: str,
                                            folder: str = "pages") -> Dict[str, Any]:
        return {
            "original": self.upload_image(original, public_id, f"{folder}/original"),
            "cropped": self.upload_image(cropped, public_id, f"{folder}/cropped"),
            "resized": self.upload_image(resized, public_id, f"{folder}/resized"),
        }
