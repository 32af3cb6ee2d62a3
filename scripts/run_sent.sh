#!/usr/bin/env bash
# Vocab build + sentence-encoder pretrain (cf. reference scripts/run_sent.sh).
set -e
SENTS=${SENTS:-./synthetic/train/sent.pickle}
VOCAB=${VOCAB:-./synthetic/vocab.pickle}
OUT=${OUT:-out/txt}

python -m txt2vid_tpu.data --sents "$SENTS" --out "$VOCAB"
python -m txt2vid_tpu.train.txt --sentences "$SENTS" --vocab "$VOCAB" --out "$OUT"
