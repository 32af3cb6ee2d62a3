"""Data-loading micro-benchmark (reference data/benchmark.py): total + avg sec/item
over dataset iteration."""

from txt2vid_tpu.utils.stopwatch import Stopwatch


def benchmark(dataset, num_items=None):
    n = len(dataset) if num_items is None else min(num_items, len(dataset))
    watch = Stopwatch()
    watch.start()
    for i in range(n):
        dataset[i]
    total = watch.stop()
    print(f"{n} items in {total:.3f}s ({total / max(n, 1):.5f} s/item)")
    return total, total / max(n, 1)


if __name__ == "__main__":
    import argparse
    from txt2vid_tpu.config import create_object
    from txt2vid_tpu.data import build_vocab
    from txt2vid_tpu.utils.misc import load_pickle

    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help="dataset spec (json/class path)")
    p.add_argument("--anno", default=None)
    p.add_argument("--vocab", default=None)
    p.add_argument("--num_items", type=int, default=None)
    a = p.parse_args()
    vocab = load_pickle(a.vocab) if a.vocab else None
    dset = create_object(a.data, vocab=vocab, anno=a.anno)
    benchmark(dset, a.num_items)
