"""Sentence-encoder pretraining CLI (reference txt2vid/train/txt.py).

Next-token prediction with the Bi-LSTM Seq2Seq: encode each caption, then decode with
teacher forcing sampled per iteration with probability `--teacher-force-p`
(txt.py:158-177), cross-entropy on the decoded logits, periodic greedy-decode + CE
eval on a held-out split (txt.py:53-87), random 80/10/10 split (txt.py:111-123),
checkpoints of {optim state, txt params} per --save-every."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from txt2vid_tpu.config import create_object
from txt2vid_tpu.data import Vocab, build_vocab, encode_caption
from txt2vid_tpu.models.txt import Seq2Seq
from txt2vid_tpu.train.setup import setup
from txt2vid_tpu.utils import status, RollingAvg, load_pickle, ensure_exists
from txt2vid_tpu.utils.checkpoint import save_state, restore_state


class SentenceDataset:
    """Token-encoded sentences from a {vid: [captions]} pickle (reference
    txt.py:21-41)."""

    def __init__(self, vocab, sents_path, max_len=32):
        sents = load_pickle(sents_path)
        self.vocab = vocab
        self.max_len = max_len
        self.examples = [encode_caption(vocab, s)[:max_len]
                         for v in sents for s in sents[v]]

    def __len__(self):
        return len(self.examples)

    def batch(self, idxs):
        caps = np.zeros((len(idxs), self.max_len), np.int32)
        lengths = np.zeros((len(idxs),), np.int32)
        for i, j in enumerate(idxs):
            c = self.examples[j]
            caps[i, :len(c)] = c
            lengths[i] = len(c)
        return jnp.asarray(caps), jnp.asarray(lengths)


def build_loss_fn(model, max_len):
    def loss_fn(params, caps, lengths, teacher_force):
        variables = {"params": params}
        _, states, _ = model.apply(variables, caps, lengths=lengths,
                                   method=Seq2Seq.encode)
        raw, _ = model.apply(variables, caps, initial_hidden=states,
                             max_seq_len=max_len - 1, teacher_force=teacher_force,
                             method=Seq2Seq.decode)
        # predict tokens 1..L from start at 0 (next-token prediction)
        targets = caps[:, 1:]
        mask = (jnp.arange(max_len - 1)[None, :] < (lengths - 1)[:, None])
        logp = jax.nn.log_softmax(raw, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)

    return loss_fn


def main(args):
    seed, _ = setup(args)

    if args.vocab:
        vocab = load_pickle(args.vocab)
    else:
        sents = load_pickle(args.sentences)
        vocab = build_vocab([s for v in sents for s in sents[v]])
    status(f"vocab size {len(vocab)}")

    dset = SentenceDataset(vocab, args.sentences, max_len=args.max_len)
    n = len(dset)
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    n_train, n_val = int(0.8 * n), int(0.1 * n)
    train_idx = order[:n_train]
    val_idx = order[n_train:n_train + n_val]
    status(f"{n} sentences: {len(train_idx)} train / {len(val_idx)} val")

    model = create_object(args.model, vocab_size=len(vocab)) if args.model else \
        Seq2Seq(vocab_size=len(vocab))
    caps, lengths = dset.batch(train_idx[:args.batch_size])
    variables = model.init(jax.random.key(seed), caps, lengths=lengths)
    params = variables["params"]

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    loss_fn = build_loss_fn(model, args.max_len)

    def make_step(teacher_force):
        def step(params, opt_state, caps, lengths):
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(p, caps, lengths, teacher_force))(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss
        return jax.jit(step, donate_argnums=(0, 1))

    step_tf = make_step(True)
    step_free = make_step(False)
    eval_loss = jax.jit(lambda p, c, l: loss_fn(p, c, l, False))

    if args.weights:
        loaded = restore_state({"optim": opt_state, "txt": params}, args.weights)
        opt_state, params = loaded["optim"], loaded["txt"]

    ensure_exists(args.out)
    from txt2vid_tpu.utils.writer import MetricsWriter
    writer = MetricsWriter(args.out)
    avg = RollingAvg(20)
    it = 0
    for epoch in range(args.epochs):
        rng.shuffle(train_idx)
        for b in range(len(train_idx) // args.batch_size):
            idxs = train_idx[b * args.batch_size:(b + 1) * args.batch_size]
            caps, lengths = dset.batch(idxs)
            tf = rng.random() < args.teacher_force_p
            params, opt_state, loss = (step_tf if tf else step_free)(
                params, opt_state, caps, lengths)
            avg.update(float(loss))
            it += 1
            if it % args.log_every == 0:
                status(f"epoch {epoch} iter {it}: loss {avg.get():.4f}")
                writer.add_scalar("loss/train", avg.get(), it)
            if it % args.save_every == 0:
                vloss = 0.0
                nb = max(len(val_idx) // args.batch_size, 1)
                for vb in range(nb):
                    vc, vl = dset.batch(
                        val_idx[vb * args.batch_size:(vb + 1) * args.batch_size])
                    vloss += float(eval_loss(params, vc, vl))
                status(f"val loss: {vloss / nb:.4f}")
                writer.add_scalar("loss/val", vloss / nb, it)
                save_state({"optim": opt_state, "txt": {"params": params}},
                           f"{args.out}/txt_iter_{it}")
    save_state({"optim": opt_state, "txt": {"params": params}}, f"{args.out}/txt_final")
    status(f"saved {args.out}/txt_final")


def cli(argv=None):
    """Console-script entry point (pyproject `txt2vid-train-txt`)."""
    p = argparse.ArgumentParser()
    p.add_argument("--sentences", required=True, help="{vid: [captions]} pickle")
    p.add_argument("--vocab", default=None)
    p.add_argument("--model", default=None, help="Seq2Seq component spec")
    p.add_argument("--out", default="txt_out")
    p.add_argument("--weights", default=None)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--max_len", type=int, default=32)
    p.add_argument("--teacher_force_p", type=float, default=0.5)
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--save_every", type=int, default=500)
    p.add_argument("--seed", type=int, default=None)
    main(p.parse_args(argv))


if __name__ == "__main__":
    cli()
