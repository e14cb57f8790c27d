"""Sequence (text / digit-string) experts: GRU encoder and decoder.

TPU-native counterpart of the reference's RNN text machinery (SURVEY.md
sections 2.5, 2.7, 3e): MultiMNIST's autoregressive digit-string decoder and
CUB's caption encoder/decoder.

Design notes (vs. the reference's per-step Python RNN loop):
  * The GRU is written out explicitly so the *input* projections of every
    timestep are computed as ONE big ``(B*T, E) @ (E, 3H)`` matmul on the
    MXU before the scan; only the genuinely sequential recurrent half runs
    inside ``lax.scan``. Static max length + stop/pad masking replaces the
    reference's variable-length decode (SURVEY.md section 3e).
  * Teacher forcing in training (``__call__``), sampled autoregressive
    decode in generation (``generate``) -- both fixed shape under jit.

Token convention: ``PAD=0, START=1, STOP=2``, real symbols from 3. Targets
are stored padded with PAD after the STOP token.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["PAD", "START", "STOP", "SeqEncoder", "SeqDecoder"]

PAD, START, STOP = 0, 1, 2


def _gru_step(h, xw, u, b):
    """One GRU step. ``xw`` is the precomputed input projection (B, 3H)."""
    hidden = h.shape[-1]
    gates = xw[..., : 2 * hidden] + h @ u[:, : 2 * hidden] + b[: 2 * hidden]
    r = nn.sigmoid(gates[..., :hidden])
    zg = nn.sigmoid(gates[..., hidden : 2 * hidden])
    n = jnp.tanh(
        xw[..., 2 * hidden :] + r * (h @ u[:, 2 * hidden :]) + b[2 * hidden :]
    )
    return (1.0 - zg) * n + zg * h


class SeqEncoder(nn.Module):
    """Token sequence -> (mu, logvar) via a GRU over embeddings."""

    n_latents: int
    vocab_size: int
    embed_dim: int = 128
    hidden: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        # tokens: (B, T) int32, PAD-padded.
        emb = nn.Embed(self.vocab_size, self.embed_dim, dtype=self.dtype)(
            tokens
        )  # (B, T, E)
        w = self.param(
            "w_in",
            nn.initializers.lecun_normal(),
            (self.embed_dim, 3 * self.hidden),
        ).astype(self.dtype)
        u = self.param(
            "u_rec",
            nn.initializers.orthogonal(),
            (self.hidden, 3 * self.hidden),
        ).astype(self.dtype)
        b = self.param(
            "b", nn.initializers.zeros, (3 * self.hidden,)
        ).astype(self.dtype)
        xw = jnp.einsum("bte,eh->bth", emb, w)  # one MXU matmul for all T
        mask = (tokens != PAD).astype(self.dtype)  # (B, T)

        def step(h, inp):
            xw_t, m_t = inp
            h_new = _gru_step(h, xw_t, u, b)
            h = m_t[:, None] * h_new + (1.0 - m_t[:, None]) * h
            return h, None

        h0 = jnp.zeros((tokens.shape[0], self.hidden), dtype=self.dtype)
        h_final, _ = jax.lax.scan(
            step, h0, (xw.swapaxes(0, 1), mask.swapaxes(0, 1))
        )
        out = nn.Dense(2 * self.n_latents, dtype=self.dtype)(h_final)
        out = out.astype(jnp.float32)
        return out[:, : self.n_latents], out[:, self.n_latents :]


class SeqDecoder(nn.Module):
    """Latent -> autoregressive token logits (teacher-forced or sampled)."""

    vocab_size: int
    max_len: int
    embed_dim: int = 128
    hidden: int = 256
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embed = nn.Embed(
            self.vocab_size, self.embed_dim, dtype=self.dtype
        )
        self.init_proj = nn.Dense(self.hidden, dtype=self.dtype)
        self.w_in = self.param(
            "w_in",
            nn.initializers.lecun_normal(),
            (self.embed_dim, 3 * self.hidden),
        )
        self.u_rec = self.param(
            "u_rec",
            nn.initializers.orthogonal(),
            (self.hidden, 3 * self.hidden),
        )
        self.b = self.param("b", nn.initializers.zeros, (3 * self.hidden,))
        self.out_proj = nn.Dense(self.vocab_size, dtype=self.dtype)

    def _init_state(self, z):
        return jnp.tanh(self.init_proj(z.astype(self.dtype)))

    def __call__(self, z, targets):
        """Teacher-forced logits ``(B, max_len, vocab)`` for training.

        ``targets``: (B, max_len) int tokens (STOP-terminated, PAD-padded).
        Input at step t is START for t=0 else targets[t-1].
        """
        inputs = jnp.concatenate(
            [jnp.full_like(targets[:, :1], START), targets[:, :-1]], axis=1
        )
        emb = self.embed(inputs)  # (B, T, E)
        u = self.u_rec.astype(self.dtype)
        b = self.b.astype(self.dtype)
        xw = jnp.einsum(
            "bte,eh->bth", emb, self.w_in.astype(self.dtype)
        )  # single input-projection matmul

        def step(h, xw_t):
            h = _gru_step(h, xw_t, u, b)
            return h, h

        _, hs = jax.lax.scan(step, self._init_state(z), xw.swapaxes(0, 1))
        hs = hs.swapaxes(0, 1)  # (B, T, H)
        # One output-projection matmul for all timesteps.
        return self.out_proj(hs).astype(jnp.float32)

    def generate(self, z, rng, temperature: float = 1.0):
        """Sampled autoregressive decode; ``temperature<=0`` means argmax.

        Returns ``(B, max_len)`` int32 tokens with everything after the
        first STOP forced to PAD (fixed-shape stop masking, SURVEY.md 3e).
        """
        u = self.u_rec.astype(self.dtype)
        b = self.b.astype(self.dtype)
        w_in = self.w_in.astype(self.dtype)
        batch = z.shape[0]

        def step(carry, step_rng):
            h, tok, stopped = carry
            xw = self.embed(tok) @ w_in
            h = _gru_step(h, xw, u, b)
            logits = self.out_proj(h).astype(jnp.float32)
            # Trace-safe temperature switch (the serving export traces
            # temperature as a runtime scalar): argmax when <= 0, else
            # sample at temperature. Both branches are cheap; jnp.where
            # beats lax.cond here (no branch dispatch inside the scan).
            t = jnp.asarray(temperature, jnp.float32)
            safe_t = jnp.where(t > 0.0, t, 1.0)
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            sampled = jax.random.categorical(
                step_rng, logits / safe_t, axis=-1
            ).astype(jnp.int32)
            nxt = jnp.where(t > 0.0, sampled, greedy)
            emitted = jnp.where(stopped, jnp.int32(PAD), nxt)
            stopped = jnp.logical_or(stopped, nxt == STOP)
            return (h, nxt, stopped), emitted

        carry = (
            self._init_state(z),
            jnp.full((batch,), START, dtype=jnp.int32),
            jnp.zeros((batch,), dtype=bool),
        )
        _, tokens = jax.lax.scan(
            step, carry, jax.random.split(rng, self.max_len)
        )
        return tokens.swapaxes(0, 1)
