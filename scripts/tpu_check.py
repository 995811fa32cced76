"""On-TPU validation: Pallas kernels parity + model forward on the axon chip.

Run with the default env (JAX_PLATFORMS=axon).  Small shapes to keep compile
time down; parity vs the jnp reference computed on the same device.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def check(name, got, want, atol=2e-3):
    got, want = np.asarray(got), np.asarray(want)
    err = np.abs(got - want).max()
    status = "OK " if err < atol else "FAIL"
    print(f"{status} {name}: max_err={err:.2e} shape={got.shape}")
    return err < atol


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    ok = True

    # --- pallas framed matmul vs jnp framing+matmul -------------------------
    from amss_tpu.ops.framing import frame_signal, overlap_add
    from amss_tpu.ops.pallas.framed_matmul import framed_matmul, pallas_stft_ri
    from amss_tpu.ops.pallas.ola import pallas_decode_ola
    from amss_tpu.ops.stft import stft_ri, istft_ri

    x = jnp.asarray(rng.standard_normal((2, 16384)), jnp.float32)
    basis = jnp.asarray(rng.standard_normal((256, 64)), jnp.float32)
    t0 = time.perf_counter()
    got = framed_matmul(x, basis, hop=64)
    got = jax.block_until_ready(got)
    print(f"framed_matmul compile+run: {time.perf_counter()-t0:.1f}s")
    want = jnp.matmul(frame_signal(x, 256, 64), basis, precision="highest")
    ok &= check("framed_matmul", got, want)

    re_p, im_p = pallas_stft_ri(x, 256, 64)
    re_r, im_r = stft_ri(x, 256, 64)
    ok &= check("pallas_stft re", re_p, re_r)
    ok &= check("pallas_stft im", im_p, im_r)

    codes = jnp.asarray(rng.standard_normal((2, 100, 64)), jnp.float32)
    dbasis = jnp.asarray(rng.standard_normal((64, 256)), jnp.float32)
    got = pallas_decode_ola(codes, dbasis, hop=64)
    want = overlap_add(jnp.matmul(codes, dbasis, precision="highest"), 64)
    ok &= check("pallas_decode_ola", got, want)

    # --- TasNet-scale short filters (L=32, stride=16) ------------------------
    sbasis = jnp.asarray(rng.standard_normal((32, 256)), jnp.float32)
    got = framed_matmul(x, sbasis, hop=16)
    want = jnp.matmul(frame_signal(x, 32, 16), sbasis, precision="highest")
    ok &= check("framed_matmul_L32", got, want)
    scodes = jnp.asarray(rng.standard_normal((2, 1023, 256)), jnp.float32)
    sdec = jnp.asarray(rng.standard_normal((256, 32)), jnp.float32)
    got = pallas_decode_ola(scodes, sdec, hop=16, length=16384)
    want = overlap_add(jnp.matmul(scodes, sdec, precision="highest"), 16,
                       length=16384)
    ok &= check("decode_ola_L32", got, want)

    # --- stft round trip on TPU (real-pair path) ----------------------------
    y = istft_ri(*stft_ri(x, 256, 64), 256, 64, length=16384)
    err = np.abs(np.asarray(y)[:, 256:-256] - np.asarray(x)[:, 256:-256]).max()
    print(f"{'OK ' if err < 1e-3 else 'FAIL'} stft_roundtrip_tpu: {err:.2e}")
    ok &= err < 1e-3

    # --- flagship forward (separate) on TPU ---------------------------------
    from amss_tpu.configs.recipes import c1_stft_dpcl
    from amss_tpu.train.engine import make_model

    model = make_model(c1_stft_dpcl().model)
    params = model.init(jax.random.PRNGKey(0))
    fn = jax.jit(lambda p, m: model.separate(p, m))
    t0 = time.perf_counter()
    est = jax.block_until_ready(fn(params, x))
    print(f"OK  dpcl_separate on TPU: {est.shape}, compile+run {time.perf_counter()-t0:.1f}s")

    # --- one train step on TPU ----------------------------------------------
    import optax

    tx = optax.adam(1e-3)
    opt = tx.init(params)
    srcs = jnp.asarray(rng.standard_normal((4, 2, 16384)), jnp.float32)

    @jax.jit
    def step(p, o):
        (l, m), g = jax.value_and_grad(model.loss_from_batch, has_aux=True)(
            p, {"sources": srcs}
        )
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, l

    t0 = time.perf_counter()
    params, opt, l = step(params, opt)
    l = float(l)
    print(f"OK  dpcl_train_step on TPU: loss={l:.4f}, compile+run {time.perf_counter()-t0:.1f}s")

    # --- optional full model-zoo pass (--full): every family, tiny sizes ----
    if "--full" in sys.argv:
        import dataclasses

        import optax

        from amss_tpu.configs.recipes import (
            c2_adapt_dpcl,
            c2_pretrain_adapt,
            c3_l41,
            c4_chimera_3mix,
        )

        def tiny(recipe):
            sep = dataclasses.replace(
                recipe.model.sep, hidden=32, layers=1, embed_dim=8
            )
            return dataclasses.replace(recipe.model, sep=sep)

        for name, mcfg, s in [
            ("c2_pretrain", tiny(c2_pretrain_adapt()), 2),
            ("c2_adapt_dpcl", tiny(c2_adapt_dpcl()), 2),
            ("c3_l41", tiny(c3_l41(n_train_speakers=8)), 2),
            ("c4_chimera", tiny(c4_chimera_3mix()), 3),
        ]:
            m = make_model(mcfg)
            p = m.init(jax.random.PRNGKey(0))
            srcs = jnp.asarray(
                rng.standard_normal((2, s, 4096)) * 0.3, jnp.float32
            )
            batch = {"sources": srcs}
            if mcfg.kind == "l41":
                batch["speaker_ids"] = jnp.zeros((2, s), jnp.int32)
            txm = optax.adam(1e-3)
            om = txm.init(p)

            @jax.jit
            def stepm(p, o, batch=batch, m=m, txm=txm):
                (l, _), g = jax.value_and_grad(m.loss_from_batch, has_aux=True)(
                    p, batch
                )
                up, o = txm.update(g, o, p)
                return optax.apply_updates(p, up), o, l

            t0 = time.perf_counter()
            p, om, l = stepm(p, om)
            lv = float(l)
            print(f"OK  {name} train step on TPU: loss={lv:.4f}, "
                  f"{time.perf_counter()-t0:.1f}s")
            ok &= np.isfinite(lv)
            if hasattr(m, "separate") and mcfg.kind != "adapt_ae":
                mixv = jnp.sum(srcs, axis=1)
                kw = {}
                if mcfg.kind == "l41":
                    kw["speaker_ids"] = batch["speaker_ids"]
                e = m.separate(p, mixv, **kw)
                e_np = np.asarray(e)
                print(f"OK  {name} separate on TPU: {e_np.shape}")
                ok &= np.isfinite(e_np).all()

    print("TPU CHECK", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
