"""Write the deployed-scale expected-key manifests to
`vist3a_tpu/io/manifests/<family>.txt` (committed; see io/manifests.py).

Run after any importer or model-config change:
    PYTHONPATH=/root/repo python tools/dump_manifests.py
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from vist3a_tpu.io import manifests  # noqa: E402


def main():
    manifests.MANIFEST_DIR.mkdir(parents=True, exist_ok=True)
    for family in manifests.FAMILIES:
        text = manifests.dump_manifest(family)
        path = manifests.MANIFEST_DIR / f"{family}.txt"
        path.write_text(text)
        print(f"{family}: {len(text.splitlines())} keys → {path}")


if __name__ == "__main__":
    main()
