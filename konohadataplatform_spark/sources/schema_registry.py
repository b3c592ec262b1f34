"""Confluent Schema-Registry REST client (stdlib-only).

Completes the Debezium AvroConverter path the reference declares
(``infrastructure/apps/kafka/debezium-postgres-connector.json``:
``value.converter=io.confluent.connect.avro.AvroConverter`` +
``schema.registry.url``): records on the wire carry only a 4-byte
schema id (see ``sources/avro_py.py`` Confluent framing); the writer
schema comes from the registry's REST API:

- ``GET  /schemas/ids/{id}``            -> ``{"schema": "<json str>"}``
- ``POST /subjects/{subject}/versions`` -> ``{"id": N}``

``SchemaRegistryClient`` is a Mapping-like facade usable anywhere a
``schema_by_id`` dict is accepted (``decode_confluent`` /
``decode_confluent_envelopes`` / ``CdcPipeline.start_stream``).

Scale/executor posture: ids are IMMUTABLE in a Schema Registry, so
resolved schemas are cached forever. The client pickles into task
closures (urllib only, no sockets held); each executor process does at
most one HTTP round-trip per distinct schema id and serves every later
record from its local cache — registry load is O(#schemas x #executors),
never O(#records).
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

# Confluent's vendor content type; most registries also accept plain JSON
_CONTENT_TYPE = "application/vnd.schemaregistry.v1+json"


class SchemaRegistryError(RuntimeError):
    """Registry reachable but the request failed (non-404): auth,
    5xx, bad payload. Distinct from an unknown id (-> None/KeyError)
    so callers never mistake an outage for a missing schema."""


class SchemaRegistryClient:
    """Minimal id->schema resolver over the Confluent REST API.

    Duck-types the ``schema_by_id`` mapping contract used by the Avro
    decode paths: ``.get(id)`` returns the parsed Avro schema dict (or
    None when the registry answers 404), ``id in client`` and
    ``iter(client)`` reflect the CACHED ids (iteration never enumerates
    a remote registry). ``register`` is provided for tests/tooling.
    """

    def __init__(self, base_url: str, timeout: float = 10.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self._cache: dict[int, dict] = {}

    # ---- mapping facade --------------------------------------------------
    def get(self, schema_id: int, default=None):
        if schema_id in self._cache:
            return self._cache[schema_id]
        raw = self._http_get(f"/schemas/ids/{int(schema_id)}")
        if raw is None:
            return default
        try:
            schema = json.loads(raw["schema"])
        except (KeyError, TypeError, ValueError) as exc:
            raise SchemaRegistryError(
                f"registry returned an unparseable schema for id "
                f"{schema_id}: {raw!r}"
            ) from exc
        self._cache[schema_id] = schema
        return schema

    def __getitem__(self, schema_id: int) -> dict:
        schema = self.get(schema_id)
        if schema is None:
            raise KeyError(schema_id)
        return schema

    def __contains__(self, schema_id: int) -> bool:
        return self.get(schema_id) is not None

    def __iter__(self):
        # cached ids only: the error path in decode_confluent prints
        # sorted(known) — enumerating a remote registry for an error
        # message would be absurd at scale
        return iter(self._cache)

    def __len__(self) -> int:
        return len(self._cache)

    # ---- write side (tests / tooling) ------------------------------------
    def register(self, subject: str, avro_schema: dict) -> int:
        """Register a schema under ``subject``; returns the global id."""
        body = json.dumps({"schema": json.dumps(avro_schema)}).encode()
        req = urllib.request.Request(
            f"{self.base_url}/subjects/{subject}/versions",
            data=body,
            headers={"Content-Type": _CONTENT_TYPE},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                out = json.loads(resp.read())
        except (urllib.error.URLError, OSError, ValueError) as exc:
            raise SchemaRegistryError(
                f"schema registration failed for subject {subject!r} at "
                f"{self.base_url}: {exc}"
            ) from exc
        sid = int(out["id"])
        self._cache[sid] = avro_schema
        return sid

    def latest(self, subject: str) -> tuple[int, dict]:
        """(id, schema) of the subject's latest version."""
        raw = self._http_get(f"/subjects/{subject}/versions/latest")
        if raw is None:
            raise SchemaRegistryError(f"unknown subject: {subject!r}")
        try:
            schema = json.loads(raw["schema"])
            sid = int(raw["id"])
        except (KeyError, TypeError, ValueError) as exc:
            raise SchemaRegistryError(
                f"registry returned an unparseable latest-version payload"
                f" for subject {subject!r}: {raw!r}"
            ) from exc
        self._cache[sid] = schema
        return sid, schema

    # ---- plumbing --------------------------------------------------------
    def _http_get(self, path: str):
        try:
            with urllib.request.urlopen(
                f"{self.base_url}{path}", timeout=self.timeout
            ) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as exc:
            if exc.code == 404:
                return None
            raise SchemaRegistryError(
                f"registry GET {path} failed: HTTP {exc.code}"
            ) from exc
        except (urllib.error.URLError, OSError, ValueError) as exc:
            raise SchemaRegistryError(
                f"registry GET {path} failed at {self.base_url}: {exc}"
            ) from exc

    # pickling ships base_url + the warm cache into task closures; each
    # executor then lazily fills its own copy
    def __getstate__(self):
        return {
            "base_url": self.base_url,
            "timeout": self.timeout,
            "_cache": self._cache,
        }

    def __setstate__(self, state):
        self.__dict__.update(state)
