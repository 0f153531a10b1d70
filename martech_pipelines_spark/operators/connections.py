"""Connection + secret resolution (SURVEY.md EP2 control plane).

The reference models Airflow-style connections: a hook asks for a
connection id, the Connection loads host/login/password/extras, and the
password field is fetched from AWS Secrets Manager with an lru-cached
client (reference: martech_pipelines/hooks/base.py:10-18,
martech_pipelines/connection.py:54-74,
martech_pipelines/hooks/aws_secret_manager.py:30-56).

Engine re-expression: the same three-layer shape with the secret *provider*
injected — an env-var provider is the default (works everywhere, testable),
and a boto3 Secrets-Manager provider slots in unchanged on AWS. All
driver-side control plane; nothing here touches executors except the final
resolved dict captured into sink closures.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from dataclasses import dataclass, field
from functools import lru_cache

SecretProvider = Callable[[str], str | None]


def env_secret_provider(name: str) -> str | None:
    """Default provider: secrets from environment variables (the secret id
    is upper-cased and non-alphanumerics become underscores)."""
    key = "".join(c if c.isalnum() else "_" for c in name).upper()
    return os.environ.get(key)


def make_aws_secret_provider(region: str = "ap-south-1") -> SecretProvider:
    """boto3-backed provider, shaped like the reference's
    ``get_secret_value`` path (lru-cached client + JSON SecretString).
    Import-gated: boto3 is absent in this container."""
    try:
        import boto3  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env without boto3
        raise ImportError("boto3 not available; use env_secret_provider") from exc

    @lru_cache(maxsize=1)
    def client():  # pragma: no cover
        import boto3

        return boto3.session.Session().client(
            service_name="secretsmanager", region_name=region
        )

    def provider(name: str) -> str | None:  # pragma: no cover
        resp = client().get_secret_value(SecretId=name)
        return resp.get("SecretString")

    return provider


@dataclass
class Connection:
    """Airflow-shaped connection record (reference: martech_pipelines/connection.py)."""

    conn_id: str
    conn_type: str = "http"
    host: str | None = None
    login: str | None = None
    password: str | None = None
    schema: str | None = None
    port: int | None = None
    extra: str | None = None

    @property
    def extra_dejson(self) -> dict:
        """Parsed extras; {} on missing/invalid JSON (reference behavior:
        headers come from ``extra_dejson`` — hooks/http.py:41-74)."""
        if not self.extra:
            return {}
        try:
            return json.loads(self.extra)
        except (TypeError, ValueError):
            return {}


class ConnectionRegistry:
    """Resolve connections by id from a config dict, filling the password
    from the secret provider when the config names a ``password_secret``.

    The registry is the test seam the reference lacks: its hooks hardwire
    Secrets Manager, which is why its own tests never exercise them
    (SURVEY.md §0)."""

    def __init__(
        self,
        connections: dict[str, dict],
        secret_provider: SecretProvider = env_secret_provider,
    ) -> None:
        self._conns = connections
        self._secrets = secret_provider

    def get(self, conn_id: str) -> Connection:
        try:
            raw = dict(self._conns[conn_id])
        except KeyError as exc:
            raise KeyError(f"unknown connection id {conn_id!r}") from exc
        secret_name = raw.pop("password_secret", None)
        conn = Connection(conn_id=conn_id, **raw)
        if secret_name and conn.password is None:
            conn.password = self._secrets(secret_name)
        return conn
