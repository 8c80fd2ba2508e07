"""Simple persistent disk KV cache (analog of acestep/local_cache.py's
diskcache-backed redis-like store): JSON/bytes values with TTL, safe for
concurrent readers within a process."""

from __future__ import annotations

import hashlib
import json
import os
import threading
import time
from typing import Any, Optional


class LocalCache:
    def __init__(self, path: str = ".cache/acestep_tpu", default_ttl_s: float = 86400.0):
        self.path = path
        self.default_ttl = default_ttl_s
        os.makedirs(path, exist_ok=True)
        self._lock = threading.Lock()

    def _file(self, key: str) -> str:
        h = hashlib.sha256(key.encode()).hexdigest()[:32]
        return os.path.join(self.path, h + ".json")

    def set(self, key: str, value: Any, ttl_s: Optional[float] = None) -> None:
        rec = {"key": key, "value": value,
               "expires": time.time() + (ttl_s if ttl_s is not None else self.default_ttl)}
        tmp = self._file(key) + ".tmp"
        with self._lock:
            with open(tmp, "w") as f:
                json.dump(rec, f)
            os.replace(tmp, self._file(key))

    def get(self, key: str, default: Any = None) -> Any:
        try:
            with open(self._file(key)) as f:
                rec = json.load(f)
        except (OSError, json.JSONDecodeError):
            return default
        if rec.get("key") != key or rec.get("expires", 0) < time.time():
            return default
        return rec["value"]

    def delete(self, key: str) -> None:
        try:
            os.remove(self._file(key))
        except OSError:
            pass

    def clear_expired(self) -> int:
        n = 0
        now = time.time()
        for name in os.listdir(self.path):
            p = os.path.join(self.path, name)
            try:
                with open(p) as f:
                    rec = json.load(f)
                if rec.get("expires", 0) < now:
                    os.remove(p)
                    n += 1
            except (OSError, json.JSONDecodeError):
                pass
        return n
