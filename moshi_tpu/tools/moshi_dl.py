"""moshi-dl: model downloader / validator.

Parity with /root/reference/tools/moshi-dl.cpp: reads a JSON manifest of
{host, path, revision, filename, sha256} entries, downloads into
MODEL_CACHE, and verifies checksums (the reference uses curl + openssl;
here urllib + hashlib).  ``--verify-only`` checks existing files.

Manifest format (same fields as tools/moshi-dl.json):
    {"files": [{"host": "https://huggingface.co", "path": "repo/name",
                "revision": "main", "filename": "model.safetensors",
                "sha256": "..."}]}
"""

import argparse
import hashlib
import json
import sys
from pathlib import Path

from moshi_tpu.tools.common import model_cache_dir


def sha256_file(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download(url: str, dest: Path) -> bool:
    import urllib.request
    try:
        print(f"downloading {url} -> {dest}")
        dest.parent.mkdir(parents=True, exist_ok=True)
        with urllib.request.urlopen(url) as resp, open(dest, "wb") as out:
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                out.write(chunk)
        return True
    except Exception as e:  # offline environments: report, don't crash
        print(f"download failed: {e}", file=sys.stderr)
        return False


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("manifest", help="moshi-dl.json style manifest")
    ap.add_argument("-o", "--out-dir", default=None)
    ap.add_argument("--verify-only", action="store_true")
    args = ap.parse_args(argv)
    with open(args.manifest) as fh:
        manifest = json.load(fh)
    out_dir = Path(args.out_dir) if args.out_dir else model_cache_dir()
    files = manifest.get("files", manifest if isinstance(manifest, list) else [])
    failures = 0
    for ent in files:
        name = ent["filename"]
        dest = out_dir / name
        if not dest.exists():
            if args.verify_only:
                print(f"MISSING {name}")
                failures += 1
                continue
            url = (f"{ent['host'].rstrip('/')}/{ent['path']}/resolve/"
                   f"{ent.get('revision', 'main')}/{name}")
            if not download(url, dest):
                failures += 1
                continue
        want = ent.get("sha256")
        if want:
            got = sha256_file(dest)
            if got != want:
                print(f"CHECKSUM MISMATCH {name}: {got} != {want}")
                failures += 1
                continue
        print(f"OK {name}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
