"""Checkpoint inspector.

Rebuild of `/root/reference/code_student_uniform/inspect_checkpoint_myfile.py`
(`print_tensors_in_checkpoint_file`): prints every tensor path, shape,
dtype and optionally values from a msgpack checkpoint.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

import flax.serialization


def print_tensors_in_checkpoint_file(
    file_name: str, tensor_name: str = "", all_tensors: bool = False
):
    with open(file_name, "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())

    def walk(node, path=""):
        if isinstance(node, dict):
            for k in sorted(node):
                walk(node[k], f"{path}/{k}" if path else str(k))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{path}/{i}")
        else:
            arr = np.asarray(node)
            if tensor_name and tensor_name not in path:
                return
            print(f"tensor_name: {path}  shape: {list(arr.shape)}  "
                  f"dtype: {arr.dtype}")
            if all_tensors or tensor_name:
                print(arr)

    walk(raw)


def main(argv=None):
    parser = argparse.ArgumentParser("Inspect a msgpack checkpoint")
    parser.add_argument("--file_name", required=True)
    parser.add_argument("--tensor_name", default="")
    parser.add_argument("--all_tensors", action="store_true")
    args = parser.parse_args(argv)
    print_tensors_in_checkpoint_file(
        args.file_name, args.tensor_name, args.all_tensors
    )


if __name__ == "__main__":
    main(sys.argv[1:])
