"""Command-line layer mirroring the reference's five entry points
(SURVEY.md section 1 CLI row) under one dispatcher:

    python -m gelslim_depth_tpu train <weights_name> [device] [flags...]
    python -m gelslim_depth_tpu test <weights_name> <device> <sub_dir> [objects...]
    python -m gelslim_depth_tpu split-data [device]
    python -m gelslim_depth_tpu generate-depth [flags...]
    python -m gelslim_depth_tpu view <sub_dir> <data_name>

Plus two TPU-native additions with no reference counterpart:

    python -m gelslim_depth_tpu quantize <weights_name> [flags...]  # int8 PTQ
    python -m gelslim_depth_tpu export <weights_name> [flags...]    # AOT .gsx artifact

The positional `device`/`gpu` argument is accepted for drop-in
compatibility with the reference commands (ref train_unet.py:58,194).
'cpu' and 'tpu' pin the JAX platform (utils.pin_platform — the env var
alone is not honored when a TPU platform plugin is installed); CUDA
ordinals have no meaning here and are ignored.
"""

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    if argv[0] in ("--version", "-V"):
        from importlib.metadata import PackageNotFoundError, version

        try:
            print(version("gelslim-depth-tpu"))
        except PackageNotFoundError:  # running from a source tree: read
            import os                 # the version straight from pyproject
            import re

            pyproject = os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))), "pyproject.toml")
            try:
                with open(pyproject) as f:
                    m = re.search(r'^version\s*=\s*"([^"]+)"', f.read(), re.M)
                print(f"{m.group(1)}+source" if m else "0.0.0+source")
            except OSError:
                print("0.0.0+source")
        return 0
    cmd, rest = argv[0], argv[1:]
    from gelslim_depth_tpu.utils import enable_compilation_cache, pin_platform

    enable_compilation_cache()
    pin_platform()  # honor JAX_PLATFORMS even with the axon plugin installed
    if cmd == "train":
        from gelslim_depth_tpu.cli.train_cmd import run
    elif cmd == "test":
        from gelslim_depth_tpu.cli.test_cmd import run
    elif cmd == "split-data":
        from gelslim_depth_tpu.cli.split_cmd import run
    elif cmd == "generate-depth":
        from gelslim_depth_tpu.cli.generate_depth_cmd import run
    elif cmd == "view":
        from gelslim_depth_tpu.cli.view_cmd import run
    elif cmd == "quantize":
        from gelslim_depth_tpu.cli.quantize_cmd import run
    elif cmd == "export":
        from gelslim_depth_tpu.cli.export_cmd import run
    else:
        print(f"unknown command {cmd!r}\n{__doc__}")
        return 2
    return run(rest) or 0
