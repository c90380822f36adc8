#!/usr/bin/env python
"""Upload a model file to the Hugging Face Hub.

Mirrors the reference's standalone uploader (reference upload_model.py:46-80):
``python upload_model.py <file> --repo_id ... [--hf_token ...]``. Pure I/O —
kept as a thin Python tool (nothing TPU about it).
"""

import argparse
import os
import sys


def upload(path: str, repo_id: str, token=None, path_in_repo=None) -> bool:
    from huggingface_hub import HfApi, create_repo

    api = HfApi(token=token)
    create_repo(repo_id, repo_type="model", exist_ok=True, token=token)
    api.upload_file(
        path_or_fileobj=path,
        path_in_repo=path_in_repo or os.path.basename(path),
        repo_id=repo_id,
        repo_type="model",
    )
    return True


def main(argv=None) -> int:
    from mit_tpu.config import CONFIG

    parser = argparse.ArgumentParser(description="Upload a model file to HF Hub.")
    parser.add_argument("file_path", type=str)
    parser.add_argument("--repo_id", type=str, default=CONFIG.HF_REPO_ID)
    parser.add_argument("--hf_token", type=str, default=None)
    parser.add_argument("--path_in_repo", type=str, default=None)
    args = parser.parse_args(argv)

    if not os.path.exists(args.file_path):
        print(f"File not found: {args.file_path}", file=sys.stderr)
        return 1
    try:
        upload(args.file_path, args.repo_id, args.hf_token, args.path_in_repo)
        print(f"Uploaded {args.file_path} to {args.repo_id}.")
        return 0
    except Exception as e:
        print(f"Upload failed: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
