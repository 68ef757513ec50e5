#!/usr/bin/env python
"""Push trained adapters (projector weights + LoRA) to the HuggingFace Hub.

Parity surface: `/root/reference/outputs/upload_to_hf.py`.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--repo-id", required=True,
                        help="e.g. youruser/gvl-tpu-adapters")
    parser.add_argument("--outputs-dir", default="outputs")
    parser.add_argument("--private", action="store_true")
    args = parser.parse_args(argv)

    from huggingface_hub import HfApi

    outputs = Path(args.outputs_dir)
    artifacts = [
        p for p in (
            outputs / "projector_weights.pt",
            outputs / "projector_weights.npz",
            outputs / "lora_adapter",
        ) if p.exists()
    ]
    if not artifacts:
        print(f"nothing to upload under {outputs}")
        return 1

    api = HfApi()
    api.create_repo(args.repo_id, exist_ok=True, private=args.private)
    for artifact in artifacts:
        if artifact.is_dir():
            api.upload_folder(folder_path=str(artifact),
                              path_in_repo=artifact.name,
                              repo_id=args.repo_id)
        else:
            api.upload_file(path_or_fileobj=str(artifact),
                            path_in_repo=artifact.name,
                            repo_id=args.repo_id)
        print(f"uploaded {artifact}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
