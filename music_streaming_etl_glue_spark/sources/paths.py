"""Path utilities (reference S10): scheme-prefix repair and slash
collapsing. Pure Python — engine-side, not operators.

Reference: ``/root/reference/scripts/compute_kpis.py:42-76``,
``validate_data.py:161-171``, ``load_dynamodb.py:74-101`` (three divergent
copies; unified here).
"""

from __future__ import annotations

import re

_SCHEME_RE = re.compile(r"^([a-z0-9+.-]+):/{1,3}", re.IGNORECASE)

#: Schemes whose URIs have an empty authority (``file:///abs/path``) —
#: the triple slash is CORRECT there and must not be collapsed into a
#: (bogus) authority component.
_NO_AUTHORITY_SCHEMES = frozenset({"file"})


def normalize_path(path: str) -> str:
    """Collapse duplicate slashes while preserving the ``scheme://`` part,
    and repair mangled prefixes like ``s3:/bucket`` or ``s3:///bucket``.
    Empty-authority schemes (``file:///…``) keep their absolute-path form."""
    path = path.strip()
    m = _SCHEME_RE.match(path)
    if m:
        scheme = m.group(1)
        rest = re.sub(r"/{2,}", "/", path[m.end():])
        if scheme.lower() in _NO_AUTHORITY_SCHEMES:
            return f"{scheme}:///{rest.lstrip('/')}"
        return f"{scheme}://{rest}"
    return re.sub(r"/{2,}", "/", path)


def split_path_list(paths: str) -> list[str]:
    """Comma-separated path list → normalized list (reference passes
    multi-path arguments as one comma-joined string)."""
    return [normalize_path(p) for p in paths.split(",") if p.strip()]
