"""Locale / i18n loader.

Role parity target: reference nunif/gui/locale.py — loads per-app
``locales/*.yml`` translation tables (en / ja / zh_CN / he_IL) keyed by the
English source string, with fallback to the key itself when a translation
is missing.  Same yml format here so the reference's locale files could be
dropped in unchanged.
"""
from __future__ import annotations

import os
from typing import Optional

import yaml

_BUILTIN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "locales")


class LocaleCatalog:
    """Translation table: ``catalog("Start")`` -> localized string."""

    def __init__(self, lang: str, table: Optional[dict] = None):
        self.lang = lang
        self.table = dict(table or {})
        self.rtl = bool(self.table.pop("_RTL", False))  # he_IL etc.

    def __call__(self, key: str) -> str:
        v = self.table.get(key)
        return v if isinstance(v, str) and v else key

    gettext = __call__

    def merge(self, other: "LocaleCatalog") -> "LocaleCatalog":
        merged = dict(self.table)
        merged.update(other.table)
        cat = LocaleCatalog(other.lang or self.lang, merged)
        cat.rtl = other.rtl or self.rtl
        return cat


def _candidates(lang: str):
    """'ja_JP.UTF-8' -> ['ja_JP', 'ja']; always ends with 'en'."""
    lang = (lang or "en").split(".")[0].replace("-", "_")
    out = [lang]
    if "_" in lang:
        out.append(lang.split("_")[0])
    if "en" not in out:
        out.append("en")
    return out


def load_locale(lang: Optional[str] = None,
                locale_dir: Optional[str] = None) -> LocaleCatalog:
    """Load the best-matching catalog for ``lang`` (default: $LANG).

    ``locale_dir`` points at an app's locales/ dir; app tables overlay the
    built-in GUI strings (reference merges shared + per-app yml the same
    way).
    """
    lang = lang or os.environ.get("LANG", "en")
    cat = _load_dir(_BUILTIN_DIR, lang)
    if locale_dir:
        cat = cat.merge(_load_dir(locale_dir, lang))
    return cat


def _load_dir(d: str, lang: str) -> LocaleCatalog:
    for cand in _candidates(lang):
        path = os.path.join(d, f"{cand}.yml")
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                table = yaml.safe_load(f) or {}
            return LocaleCatalog(cand, table)
    return LocaleCatalog("en", {})


def available_languages(locale_dir: Optional[str] = None) -> list:
    d = locale_dir or _BUILTIN_DIR
    try:
        return sorted(os.path.splitext(f)[0] for f in os.listdir(d)
                      if f.endswith(".yml"))
    except OSError:
        return []
