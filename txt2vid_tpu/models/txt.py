"""Bi-LSTM sentence encoder / decoder (reference txt2vid/models/txt/basic.py).

RecurrentModel: Embedding(256) -> 4-layer bidirectional LSTM (128 per direction) ->
per-token outputs + the sentence encoding hn = [last-layer forward final hidden ‖
backward final hidden] (256-d, basic.py:49-70), with padding handled by seq_lengths
(the functional equivalent of pack_padded_sequence). `sample` is the greedy /
teacher-forced autoregressive decode (basic.py:73-101): each step runs the (bi)LSTM on
a length-1 sequence, exactly as torch does when the decoder shares the bidirectional
encoder weights.

Seq2Seq shares encoder weights as decoder unless separate_decoder (basic.py:4-22).
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from txt2vid_tpu.ops.initializers import make_kernel_init


class RecurrentModel(nn.Module):
    vocab_size: int
    embed_size: int = 256
    hidden_size: int = 256          # total across directions, as the reference
    encoding_size: int = 256
    num_layers: int = 4
    bi: bool = True
    is_decoder: bool = False
    init_method: str = "xavier"

    @property
    def per_dir(self) -> int:
        return self.hidden_size // 2 if self.bi else self.hidden_size

    def setup(self):
        per_dir = self.per_dir
        self.embed = nn.Embed(self.vocab_size, self.embed_size,
                              embedding_init=make_kernel_init(self.init_method))
        fwd, bwd = [], []
        for i in range(self.num_layers):
            fwd.append(nn.RNN(nn.OptimizedLSTMCell(per_dir), name=f"l{i}_fwd"))
            if self.bi:
                bwd.append(nn.RNN(nn.OptimizedLSTMCell(per_dir), reverse=True,
                                  keep_order=True, name=f"l{i}_bwd"))
        self.fwd_rnns = fwd
        self.bwd_rnns = bwd
        if self.is_decoder:
            self.to_vocab = nn.Dense(self.vocab_size,
                                     kernel_init=make_kernel_init(self.init_method))

    def __call__(self, x, lengths=None, initial_state=None):
        """x: (B, L) int tokens; lengths: (B,) valid lengths.
        Returns (out (B, L, hidden), hidden_states, hn (B, encoding_size))."""
        h = self.embed(x)
        states = []
        for i in range(self.num_layers):
            init_f = init_b = None
            if initial_state is not None:
                init_f = initial_state[i][0]
                init_b = initial_state[i][1] if self.bi else None
            carry_f, out_f = self.fwd_rnns[i](
                h, seq_lengths=lengths, initial_carry=init_f, return_carry=True)
            if self.bi:
                carry_b, out_b = self.bwd_rnns[i](
                    h, seq_lengths=lengths, initial_carry=init_b, return_carry=True)
                h = jnp.concatenate([out_f, out_b], axis=-1)
                states.append((carry_f, carry_b))
            else:
                h = out_f
                states.append((carry_f, None))

        if self.bi:
            hn = jnp.concatenate([states[-1][0][1], states[-1][1][1]], axis=-1)
        else:
            hn = states[-1][0][1]
        return h, states, hn

    def _step(self, tok, states):
        """One decode step: length-1 sequence through the full stack."""
        h = self.embed(tok)[:, None, :]                      # (B, 1, E)
        new_states = []
        for i in range(self.num_layers):
            carry_f, out_f = self.fwd_rnns[i](
                h, initial_carry=states[i][0], return_carry=True)
            if self.bi:
                carry_b, out_b = self.bwd_rnns[i](
                    h, initial_carry=states[i][1], return_carry=True)
                h = jnp.concatenate([out_f, out_b], axis=-1)
                new_states.append((carry_f, carry_b))
            else:
                h = out_f
                new_states.append((carry_f, None))
        logits = self.to_vocab(h[:, 0, :])
        return logits, new_states

    def sample(self, true_inputs, initial_hidden=None, max_seq_len: int = 60,
               teacher_force: bool = False):
        """Greedy / teacher-forced decode (reference basic.py:73-101). true_inputs:
        (B, L) with the start token at position 0. Returns (raw_outputs
        (B, max_seq_len, V), symbols (B, max_seq_len))."""
        assert self.is_decoder
        b = true_inputs.shape[0]
        per_dir = self.per_dir
        if initial_hidden is None:
            zero = (jnp.zeros((b, per_dir)), jnp.zeros((b, per_dir)))
            initial_hidden = [(zero, zero if self.bi else None)
                              for _ in range(self.num_layers)]
        # lax.scan over decode steps (one traced step instead of a max_seq_len-deep
        # Python unroll of the 4-layer bi-LSTM — the reference's per-token loop,
        # basic.py:85-97, would blow up compile time and program size under jit)
        def body(mdl, carry, t):
            tok, states = carry
            logits, new_states = mdl._step(tok, states)
            pred = jnp.argmax(logits, axis=-1).astype(tok.dtype)
            if teacher_force:
                idx = jnp.minimum(t, true_inputs.shape[1] - 1)
                nxt = jnp.take(true_inputs, idx, axis=1)
            else:
                nxt = pred
            return (nxt, new_states), (logits, pred)

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=0, out_axes=1)
        carry0 = (true_inputs[:, 0], initial_hidden)
        _, (raw, syms) = scan(self, carry0, jnp.arange(max_seq_len))
        return raw, syms


class Seq2Seq(nn.Module):
    separate_decoder: bool = False
    vocab_size: int = 0
    embed_size: int = 256
    hidden_size: int = 256
    num_layers: int = 4
    init_method: str = "xavier"

    @property
    def encoding_size(self) -> int:
        return self.hidden_size

    def setup(self):
        self.encoder = RecurrentModel(vocab_size=self.vocab_size,
                                      embed_size=self.embed_size,
                                      hidden_size=self.hidden_size,
                                      encoding_size=self.hidden_size,
                                      num_layers=self.num_layers,
                                      is_decoder=not self.separate_decoder,
                                      init_method=self.init_method)
        if self.separate_decoder:
            self.sep_decoder = RecurrentModel(vocab_size=self.vocab_size,
                                              embed_size=self.embed_size,
                                              hidden_size=self.hidden_size,
                                              encoding_size=self.hidden_size,
                                              num_layers=self.num_layers,
                                              is_decoder=True, bi=False,
                                              init_method=self.init_method)

    @property
    def decoder(self):
        return self.sep_decoder if self.separate_decoder else self.encoder

    def encode(self, x, lengths=None):
        return self.encoder(x, lengths=lengths)

    def decode(self, true_inputs, initial_hidden=None, max_seq_len: int = 60,
               teacher_force: bool = False):
        return self.decoder.sample(true_inputs, initial_hidden=initial_hidden,
                                   max_seq_len=max_seq_len, teacher_force=teacher_force)

    def __call__(self, x, lengths=None):
        # default entry point (used for init): touches encoder AND decoder so a single
        # init creates every parameter (linen creates params lazily on first call)
        out = self.encode(x, lengths=lengths)
        self.decode(x[:, :1], max_seq_len=1)
        return out
