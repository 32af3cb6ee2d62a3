"""`python -m txt2vid_tpu.data` — vocab build CLI (reference data/__init__.py CLI)."""

import argparse

from txt2vid_tpu.data import main

parser = argparse.ArgumentParser()
parser.add_argument("--sents", type=str, required=True,
                    help="sentence pickle {key: [sentences]}")
parser.add_argument("--out", type=str, required=True, help="output vocab pickle")
main(parser.parse_args())
