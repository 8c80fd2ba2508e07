"""Checkpoint resolution with HF <-> ModelScope failover (analog of
acestep/model_downloader.py:22-195).

Resolution order per component: explicit path -> local cache dir -> download
(huggingface_hub, falling back to modelscope after a connectivity probe).
Downloads are network-gated; in air-gapped environments only local paths work.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

DEFAULT_CACHE = os.path.expanduser(os.environ.get("ACESTEP_TPU_HOME", "~/.cache/acestep_tpu/models"))

COMPONENTS = {
    "main": "ACE-Step/ACE-Step-v1.5",               # vae + text encoder + default DiT
    "dit_turbo": "ACE-Step/acestep-v15-turbo",
    "lm_0.6B": "ACE-Step/acestep-5Hz-lm-0.6B",
    "lm_1.7B": "ACE-Step/acestep-5Hz-lm-1.7B",
    "lm_4B": "ACE-Step/acestep-5Hz-lm-4B",
}


def probe_connectivity(url: str = "https://huggingface.co", timeout: float = 3.0) -> bool:
    import urllib.request

    try:
        urllib.request.urlopen(url, timeout=timeout)
        return True
    except Exception:
        return False


def resolve(component: str, path: Optional[str] = None,
            cache_dir: str = DEFAULT_CACHE, allow_download: bool = True) -> str:
    """Return a local directory for the component, downloading if permitted."""
    if path:
        if os.path.exists(path):
            return path
        raise FileNotFoundError(f"checkpoint path not found: {path}")
    repo = COMPONENTS.get(component, component)
    local = os.path.join(cache_dir, repo.replace("/", "__"))
    if os.path.isdir(local) and os.listdir(local):
        return local
    if not allow_download:
        raise FileNotFoundError(
            f"{component} not cached at {local} and downloads disabled")
    if probe_connectivity():
        from huggingface_hub import snapshot_download

        return snapshot_download(repo, local_dir=local)
    # HF unreachable: try ModelScope mirror (model_downloader.py failover)
    try:
        from modelscope import snapshot_download as ms_download  # type: ignore

        return ms_download(repo, cache_dir=local)
    except ImportError as e:
        raise RuntimeError(
            f"no connectivity to huggingface.co and modelscope unavailable: {e}"
        ) from e


def main(argv=None):
    """``acestep-tpu-download`` console entry (acestep-download analog):
    resolve/download one or all known components into the cache dir."""
    import argparse

    ap = argparse.ArgumentParser(
        description="Download ACE-Step checkpoints (HF <-> ModelScope failover)")
    ap.add_argument("components", nargs="*", default=[],
                    help=f"components or repo ids (default: main); known: "
                         f"{', '.join(COMPONENTS)}")
    ap.add_argument("--all", action="store_true", help="fetch every known component")
    ap.add_argument("--cache-dir", default=DEFAULT_CACHE)
    ap.add_argument("--check", action="store_true",
                    help="only report cache state, never download")
    args = ap.parse_args(argv)

    wanted = list(COMPONENTS) if args.all else (args.components or ["main"])
    status = 0
    for comp in wanted:
        try:
            local = resolve(comp, cache_dir=args.cache_dir,
                            allow_download=not args.check)
            print(f"{comp}: {local}")
        except (FileNotFoundError, RuntimeError) as e:
            print(f"{comp}: MISSING ({e})")
            status = 1
    return status


if __name__ == "__main__":
    raise SystemExit(main())
