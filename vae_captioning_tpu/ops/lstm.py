"""TPU-native LSTM machinery.

Replaces the reference's cell plumbing (``utils/rnn_model.py:7-51``:
MultiRNNCell + DropoutWrapper + ``rnn_placeholders`` state injection) and
``tf.nn.dynamic_rnn``.  Design:

  * One **fused cell**: a single ``[E+H, 4H]`` matmul per step — one MXU
    call instead of four small ones.  Gate order (i, f, g, o) and the
    TF-LSTMCell ``forget_bias = 1.0`` are preserved because they shape
    early training dynamics.
  * **`nn.scan` over time** with per-step length masking replaces
    ``dynamic_rnn(sequence_length=...)``: carry copies through after a
    sequence ends, outputs are zeroed — identical semantics, one compiled
    loop.
  * **No state placeholders.** Decode carries the ``(c, h)`` PyTree
    explicitly through jitted step functions (see ops/decoding.py); the
    ``rnn_placeholders`` trick exists only because TF1 graphs can't.

Params are fp32; matmuls run in ``compute_dtype`` (bfloat16 on TPU) with
fp32 accumulation via ``preferred_element_type``.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# carry for one layer: (c, h), each [B, H]
LayerCarry = Tuple[jax.Array, jax.Array]
# carry for a stack: tuple over layers
Carry = Tuple[LayerCarry, ...]


class LSTMCell(nn.Module):
    """Fused LSTM cell: gates = [x, h] @ W + b, W: [E+H, 4H].

    Two calling forms, one parameter set:
      * ``x: [B, E]`` — single step, concat form (decode path; the fused
        Pallas decode kernel mirrors this exactly).
      * ``x: [B, T, E]`` with ``mask: [B, T]`` — masked teacher-forcing
        sequence.  The input half of the gate matmul is HOISTED out of
        the time scan as one big ``[B·T, E] @ [E, 4H]`` MXU matmul
        (teacher-forcing inputs are known up front); the scan body is
        only ``h @ W_h`` + elementwise.  This removes the per-step
        ``concat(x, h)`` carry copies the round-2 xplane trace showed as
        1.7 ms async slice-starts (VERDICT r2 #2) and feeds the MXU one
        large matmul instead of T skinny ones.
    """

    hidden_size: int
    compute_dtype: Any = jnp.float32
    forget_bias: float = 1.0
    use_fused_seq: bool = False   # Pallas sequence kernel (TPU + bf16)

    @nn.compact
    def __call__(self, carry: LayerCarry, x: jax.Array,
                 mask: jax.Array | None = None,
                 time_major_out: bool = False,
                 collect_outputs: bool = True):
        c, h = carry
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.xavier_uniform(),
            (in_features + self.hidden_size, 4 * self.hidden_size))
        bias = self.param("bias", nn.initializers.zeros,
                          (4 * self.hidden_size,))
        cd = self.compute_dtype

        def gate_math(gates, c, h):
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            new_c = (jax.nn.sigmoid(f + self.forget_bias) * c
                     + jax.nn.sigmoid(i) * jnp.tanh(g))
            new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
            return new_c, new_h

        if x.ndim == 2:  # single step, concat form
            zh = jnp.concatenate([x, h], axis=-1)
            gates = jax.lax.dot_general(
                zh.astype(cd), kernel.astype(cd),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bias
            new_c, new_h = gate_math(gates, c, h)
            return (new_c, new_h), new_h

        # masked sequence [B, T, E]: hoisted input projection.
        # Transpose to time-major BEFORE the matmul: the scan consumes
        # [T, B, 4H], and transposing the [B, T, E] input (E = 256/512)
        # moves 4-8× fewer bytes than transposing the [B, T, 4H] gates
        # after (the round-3 trace showed the post-matmul transpose as a
        # ~3 ms/step 126 MB copy).
        assert mask is not None
        if (self.use_fused_seq and in_features % 128 == 0
                and self.hidden_size % 128 == 0
                and self.forget_bias == 1.0):
            # fully fused Pallas sequence kernel (fwd + custom-VJP bwd):
            # state rides VMEM scratch across the whole sequence — no
            # per-step DUS stacking / convert fusions (ops/fused_lstm_seq).
            # Routed through the dp shard_map wrapper: on a >1-device
            # mesh each chip runs the kernel on its own rows
            # (parallel/kernel_shard.py; no-op single-chip)
            from vae_captioning_tpu.parallel.kernel_shard import lstm_seq
            (c, h), hs = lstm_seq(
                x.swapaxes(0, 1), kernel[:in_features],
                kernel[in_features:], bias, c, h, mask)
            if not collect_outputs:
                return (c, h), None
            return (c, h), hs if time_major_out else hs.swapaxes(0, 1)

        w_h = kernel[in_features:].astype(cd)
        # (bf16 storage for xw / the stacked outputs was tried and
        # REVERTED: XLA outlined the converts into 24 per-step
        # [1, B, H] convert+DUS fusions costing +2.3 ms/step at train
        # shapes — the scan stacking pattern, not the byte count, is
        # the bottleneck.  The fused Pallas sequence kernel
        # (ops/fused_lstm_seq.py) is the real fix.)
        xw = jax.lax.dot_general(
            x.swapaxes(0, 1).astype(cd), kernel[:in_features].astype(cd),
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [T, B, 4H]

        def body(ch, inp):
            c, h = ch
            xw_t, m_t = inp                              # [B, 4H], [B]
            gates = xw_t + jax.lax.dot_general(
                h.astype(cd), w_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + bias
            new_c, new_h = gate_math(gates, c, h)
            m = m_t[:, None]
            new_ch = (jnp.where(m, new_c, c), jnp.where(m, new_h, h))
            if not collect_outputs:
                return new_ch, None
            return new_ch, jnp.where(m, new_h, 0.0)

        (c, h), hs = jax.lax.scan(body, (c, h), (xw, mask.T))
        if hs is None or time_major_out:
            return (c, h), hs                            # [T, B, H] / None
        return (c, h), hs.swapaxes(0, 1)                 # [B, T, H]


class LSTMStack(nn.Module):
    """Multi-layer LSTM with single-step and masked-sequence application.

    ``num_layers`` defaults to 1 in every reference config
    (``utils/parameters.py:20,25``); the stack mirrors MultiRNNCell for
    the general case.  ``output_keep_rate`` reproduces DropoutWrapper's
    output dropout (``utils/rnn_model.py:36-38``), active only when a
    ``dropout`` RNG is provided.
    """

    hidden_size: int
    num_layers: int = 1
    compute_dtype: Any = jnp.float32
    output_keep_rate: float = 1.0
    use_fused_seq: bool = False

    def setup(self):
        self.cells = [
            LSTMCell(self.hidden_size, self.compute_dtype,
                     use_fused_seq=self.use_fused_seq, name=f"cell_{i}")
            for i in range(self.num_layers)
        ]

    def zero_carry(self, batch_size: int) -> Carry:
        z = jnp.zeros((batch_size, self.hidden_size), jnp.float32)
        return tuple((z, z) for _ in range(self.num_layers))

    def _maybe_drop(self, h: jax.Array, deterministic: bool) -> jax.Array:
        if self.output_keep_rate >= 1.0 or deterministic:
            return h
        keep = self.output_keep_rate
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, h.shape)
        return jnp.where(mask, h / keep, 0.0)

    def step(self, carry: Carry, x: jax.Array,
             deterministic: bool = True) -> Tuple[Carry, jax.Array]:
        """One timestep through all layers; input [B, E] → output [B, H]."""
        new_carry = []
        inp = x
        for cell, layer_carry in zip(self.cells, carry):
            layer_carry, inp = cell(layer_carry, inp)
            inp = self._maybe_drop(inp, deterministic)
            new_carry.append(layer_carry)
        return tuple(new_carry), inp

    def __call__(self, carry: Carry, xs: jax.Array, lengths: jax.Array,
                 deterministic: bool = True,
                 time_major_out: bool = False,
                 collect_outputs: bool = True) -> Tuple[Carry, jax.Array]:
        """Masked sequence run (dynamic_rnn semantics).

        xs: [B, T, E], lengths: [B] → (final_carry_at_length, outputs [B, T, H]).
        Steps at t >= length copy the carry through and emit zeros.

        ``time_major_out`` returns the outputs as [T, B, H] (the scan's
        native layout — skips a 63 MB relayout per call at train shapes);
        ``collect_outputs=False`` skips stacking outputs entirely (the
        encoder only uses the final carry).  Both apply to the LAST
        layer only; with multiple layers the inter-layer handoff keeps
        the batch-major convention.
        """
        T = xs.shape[1]
        t_index = jnp.arange(T, dtype=lengths.dtype)
        mask = t_index[None, :] < lengths[:, None]  # [B, T]

        if deterministic or self.output_keep_rate >= 1.0:
            # fast path: per-layer hoisted-input scan (see LSTMCell).
            # Inter-layer masking zeroes each layer's masked outputs
            # instead of only the last one's — observationally identical
            # (downstream carries are mask-frozen either way).
            new_carry = []
            inp = xs
            last = len(self.cells) - 1
            for li, (cell, layer_carry) in enumerate(zip(self.cells, carry)):
                layer_carry, inp = cell(
                    layer_carry, inp, mask,
                    time_major_out=(li == last and time_major_out),
                    collect_outputs=(li != last or collect_outputs))
                new_carry.append(layer_carry)
            return tuple(new_carry), inp

        # dropout path: per-step RNG splitting needs nn.scan
        def body(mod, carry, inp):
            x_t, m_t = inp
            stepped, h = mod.step(carry, x_t, deterministic)
            carry = jax.tree.map(
                lambda n, o: jnp.where(m_t[:, None], n, o), stepped, carry)
            h = jnp.where(m_t[:, None], h, 0.0)
            return carry, h

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1, out_axes=1,
        )
        carry, hs = scan(self, carry, (xs, mask))
        if not collect_outputs:
            hs = None
        elif time_major_out:
            hs = hs.swapaxes(0, 1)
        return carry, hs
