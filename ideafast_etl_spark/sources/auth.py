"""Connector credential plumbing (SURVEY.md §2.3).

The reference keeps a lazy JWT session per vendor hook: it validates token
expiry locally (decode without signature verification), refreshes through a
vendor-specific request when expired, extracts the new token from the
response via a dot-path, and persists it so other tasks/workers reuse it
(ideafast_etl/hooks/jwt.py:99-189). That is connector-internal credential
management — the Spark analog lives beside the sources (driver-side; executors
receive short-lived signed URLs, never refresh logic).

Implemented without third-party JWT libraries: expiry validation only needs
the (public, unauthenticated) base64url payload decode — signature
verification is explicitly skipped by the reference too
(``verify_signature: False`` — jwt.py:110).
"""

from __future__ import annotations

import base64
import json
import time
from collections.abc import Callable
from typing import Any


def extract_dot_path(payload: Any, path: str) -> Any:
    """A2 — navigate ``a.b.[1].c`` (dict keys + ``[n]`` list indices) through
    a JSON payload; raises KeyError when absent (jwt.py:59-85 semantics —
    the Column-expression counterpart is
    :func:`ideafast_etl_spark.functions.scalar.json_dot_path`)."""
    node = payload
    for part in [p for p in path.split(".") if p]:
        if part.startswith("[") and part.endswith("]"):
            idx = int(part[1:-1])
            try:
                node = node[idx]
            except (IndexError, TypeError) as e:
                raise KeyError(f"index {part} not found in path {path!r}") from e
        else:
            if not isinstance(node, dict) or part not in node:
                raise KeyError(f"key {part!r} not found in path {path!r}")
            node = node[part]
    return node


def _jwt_exp(token: str) -> int | None:
    """Expiry claim from an (unverified) JWT; None if absent/undecodable."""
    try:
        payload_b64 = token.split(".")[1]
        payload_b64 += "=" * (-len(payload_b64) % 4)
        claims = json.loads(base64.urlsafe_b64decode(payload_b64))
        exp = claims.get("exp")
        return int(exp) if exp is not None else None
    except Exception:
        return None


class JwtSessionManager:
    """A1 — lazy token holder with local expiry validation, injected refresh,
    and persistence write-back.

    ``refresh`` performs the vendor auth call and returns the raw response
    payload; ``token_path`` locates the token inside it (dot-path);
    ``persist`` (optional) writes the refreshed token back to the connection
    store so concurrent workers reuse it (jwt.py:134-148).
    """

    def __init__(
        self,
        refresh: Callable[[], Any],
        token_path: str = "token",
        persist: Callable[[str], None] | None = None,
        initial_token: str | None = None,
        leeway_seconds: int = 30,
        now: Callable[[], float] = time.time,
    ) -> None:
        self._refresh = refresh
        self._token_path = token_path
        self._persist = persist
        self._token = initial_token
        self._leeway = leeway_seconds
        self._now = now

    def _valid(self, token: str | None) -> bool:
        if not token:
            return False
        exp = _jwt_exp(token)
        if exp is None:
            # no expiry claim → treat as opaque long-lived token
            return True
        return exp > self._now() + self._leeway

    def get_token(self) -> str:
        if not self._valid(self._token):
            payload = self._refresh()
            token = extract_dot_path(payload, self._token_path)
            if not isinstance(token, str) or not token:
                raise ValueError(
                    f"refresh response had no token at {self._token_path!r}"
                )
            self._token = token
            if self._persist:
                self._persist(token)
        return self._token  # type: ignore[return-value]

    def auth_header(self) -> dict[str, str]:
        return {"Authorization": f"Bearer {self.get_token()}"}
