"""GeneratorService: fixed-shape batched serving path (txt2vid_tpu/serve.py).
The reference has no serving story (test.py is dead code); these pin the
chunk/pad request handling, uint8 output contract, and determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from txt2vid_tpu.data import Vocab
from txt2vid_tpu.gan.cond_gan import CondGan
from txt2vid_tpu.gan.train_step import TrainConfig, init_state
from txt2vid_tpu.models import tganv2_cond
from txt2vid_tpu.models.txt import Seq2Seq
from txt2vid_tpu.serve import GeneratorService


@pytest.fixture(scope="module")
def service():
    vocab = Vocab()
    for w in (["digit", "is", "left", "right", "up", "down", "and", "moving"]
              + [str(i) for i in range(10)]):
        vocab.add_word(w)
    enc = Seq2Seq(vocab_size=len(vocab), embed_size=8, hidden_size=16,
                  num_layers=1)
    gen = tganv2_cond.MultiScaleGen(latent_size=16, width=16, height=16,
                                    num_channels=1, fm_channels=16,
                                    additional_blocks=(8,), num_frames=4,
                                    cond_dim=16, use_pallas=False)
    discrim = tganv2_cond.MultiScaleDiscrim(discrim_down_blocks=(1, 1),
                                            num_channels=1, with_attn=False,
                                            cond_dim=16, use_pallas=False)
    gan = CondGan(gen=gen, discrims=[discrim], cond_encoder=enc)
    cfg = TrainConfig(frame_sizes=(8, 16), latent_size=16)
    batch = {"video": jnp.zeros((4, 4, 16, 16, 1)),
             "captions": jnp.ones((4, 6), jnp.int32),
             "lengths": jnp.full((4,), 6, jnp.int32)}
    opt = optax.adam(1e-4)
    state = init_state(gan, jax.random.key(0), batch, opt, opt, cfg)
    return GeneratorService(gan, state, vocab=vocab, batch_size=4,
                            max_caption_len=8)


class TestGeneratorService:
    def test_chunk_and_pad(self, service):
        # 5 requests through batch_size 4: two compiled calls, padded tail dropped
        sents = ["digit 3 is moving left and right."] * 5
        out = service.generate(sentences=sents, seed=0)
        assert out.shape == (5, 4, 16, 16, 1)
        assert out.dtype == np.uint8

    def test_deterministic_and_seed_sensitive(self, service):
        sents = ["digit 7 is moving up and down."] * 2
        a = service.generate(sentences=sents, seed=3)
        b = service.generate(sentences=sents, seed=3)
        c = service.generate(sentences=sents, seed=4)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_unconditional_num(self, service):
        out = service.generate(num=3, seed=1)
        assert out.shape == (3, 4, 16, 16, 1)

    def test_single_program(self, service):
        # the serving trap is per-request recompiles: request sizes 1..5 must all
        # hit the ONE fixed-shape executable
        before = service._run._cache_size()
        for n in (1, 2, 5):
            service.generate(sentences=["digit 1 is moving left and right."] * n)
        assert service._run._cache_size() == max(before, 1)
