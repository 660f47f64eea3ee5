from .render import render_all  # noqa: F401
