"""GUI framework for nunif_tpu apps.

Role parity target: reference ``nunif/gui/`` (L6) — wxPython widgets shared
by the app GUIs: tqdm->wx event bridge (nunif/gui/common.py:16-38),
persistent widget/layout state, ``IOPathPanel``/``VideoEncodingBox`` option
panels, and per-app yml locale i18n (nunif/gui/locale.py).

TPU re-design: this framework targets headless TPU servers, so the GUI is a
**browser app** served by a stdlib HTTP server instead of a desktop wx
process: the same four concerns map to

* :mod:`.progress`    — thread-safe progress event hub (tqdm-bridge role)
  streamed to the browser over server-sent events
* :mod:`.persistence` — JSON settings store (wx persistence role)
* :mod:`.locale`      — per-app ``locales/*.yml`` i18n loader (same format)
* :mod:`.server`      — the browser GUI driving waifu2x / iw3 / stlizer
  pipelines (``python -m nunif_tpu.gui``)
"""
from .progress import ProgressBridge, ProgressEvent
from .persistence import SettingsStore
from .locale import load_locale, LocaleCatalog

__all__ = [
    "ProgressBridge", "ProgressEvent", "SettingsStore",
    "load_locale", "LocaleCatalog",
]
