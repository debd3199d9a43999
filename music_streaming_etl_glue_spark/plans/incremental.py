"""Incremental-processing state: file ledger + content-hash change
detection (reference orchestration layer,
``/root/reference/dags/music_streaming_pipeline.py:302-389, 433-482``).

The reference keeps two JSON ledgers in S3: ``processed_streams.json``
(fact files already ingested) and ``reference_data_state.json`` (MD5 of
each dimension file). This module is the engine-native equivalent for
batch-increment runs; the Structured Streaming twin
(``streaming/file_pipeline.py``) gets the same exactly-once file tracking
from its checkpoint instead.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass


def _atomic_write(path: str, payload: dict) -> None:
    tmp = f"{path}.tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(payload, fh, indent=2, sort_keys=True)
    os.replace(tmp, path)


@dataclass
class FileLedger:
    """Tracks which input files a pipeline already processed."""

    path: str

    def processed(self) -> set[str]:
        if not os.path.exists(self.path):
            return set()
        with open(self.path, encoding="utf-8") as fh:
            return set(json.load(fh).get("processed", []))

    def new_files(self, discovered: list[str]) -> list[str]:
        """Ledger diff: discovered minus processed, stable order."""
        done = self.processed()
        return [f for f in discovered if f not in done]

    def mark_processed(self, files: list[str]) -> None:
        merged = sorted(self.processed() | set(files))
        _atomic_write(self.path, {"processed": merged})


def content_hash(path: str, chunk: int = 1 << 20) -> str:
    """Streaming MD5 of a local file (dimension change detection)."""
    h = hashlib.md5()
    with open(path, "rb") as fh:
        while True:
            b = fh.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


@dataclass
class DimensionState:
    """Re-process a dimension only when its content hash changed
    (reference ``reference_data_state.json``)."""

    path: str

    def _load(self) -> dict[str, str]:
        if not os.path.exists(self.path):
            return {}
        with open(self.path, encoding="utf-8") as fh:
            return json.load(fh)

    def changed(self, name: str, file_path: str) -> bool:
        return self._load().get(name) != content_hash(file_path)

    def update(self, name: str, file_path: str) -> None:
        state = self._load()
        state[name] = content_hash(file_path)
        _atomic_write(self.path, state)
