"""Static i18n page generator for the waifu2x web server.

Behavioral parity target: reference waifu2x/web/webgen/ — render the
public front page once per locale (``index.html`` for English,
``index.{lang}.html`` for others) from a template + ``locales/*.yml``
string tables, so the server serves pregenerated static pages instead of
templating per request.

Differences by design: the reference uses bottle's SimpleTemplate; here
the template is ``string.Template`` (stdlib, ``${key}`` placeholders) and
the locale tables reuse :class:`nunif_tpu.gui.locale.LocaleCatalog` — one
yml i18n format across GUI and web.
"""
from .gen import generate_pages, render_page, load_locales, pick_language

__all__ = ["generate_pages", "render_page", "load_locales", "pick_language"]
