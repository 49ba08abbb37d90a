"""Background-thread prefetching image iterator.

Behavioral parity target: reference nunif/utils/image_loader.py:20-113 —
ImageLoader iterates a directory/file list, decoding images on a worker
thread ahead of the consumer (the device stays busy while the host
decodes the next image).
"""
from __future__ import annotations

import os
import queue
import threading

from .pil_io import load_image

IMG_EXTENSIONS = (".png", ".jpg", ".jpeg", ".webp", ".bmp", ".tif", ".tiff")


def list_images(directory):
    files = []
    for name in sorted(os.listdir(directory)):
        if os.path.splitext(name)[-1].lower() in IMG_EXTENSIONS:
            files.append(os.path.join(directory, name))
    return files


class ImageLoader:
    """Iterate (image, meta) tuples with a prefetch thread.

    files: list of paths, or use directory=...; load_func defaults to
    pil_io.load_image and may be swapped (reference behavior).
    """

    def __init__(self, files=None, directory=None, max_queue_size=128,
                 load_func=load_image, load_func_kwargs=None):
        assert files is not None or directory is not None
        self.files = list(files) if files is not None else list_images(directory)
        self.max_queue_size = max_queue_size
        self.load_func = load_func
        self.load_func_kwargs = load_func_kwargs or {}
        self.proc = None
        self.queue = None

    def __len__(self):
        return len(self.files)

    def _worker(self):
        for f in self.files:
            try:
                ret = self.load_func(f, **self.load_func_kwargs)
            except Exception as e:  # keep iterating past broken files
                ret = None, {"filename": f, "error": str(e)}
            self.queue.put(ret)
        self.queue.put(StopIteration)

    def __iter__(self):
        self.queue = queue.Queue(self.max_queue_size)
        self.proc = threading.Thread(target=self._worker, daemon=True)
        self.proc.start()
        return self

    def __next__(self):
        item = self.queue.get()
        if item is StopIteration:
            self.proc.join()
            raise StopIteration()
        return item
