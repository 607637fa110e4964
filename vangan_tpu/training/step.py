"""The jit-compiled VAN-GAN train/test step.

TPU-native re-derivation of the reference's persistent-GradientTape step
(vangan.py:270-440). The reference records one forward and pulls FOUR separate
backward passes (one per optimizer.minimize). Here the four restricted
gradients are computed in ONE forward + ONE backward: a combined scalar loss
with `stop_gradient` inserted exactly where the reference's per-optimizer
``var_list`` restriction discards gradients:

- cycle/seg losses:      grads flow to the *outer* generator only — the inner
                         generator's output is stop_gradient'ed (the reference
                         discards inner-generator grads because each cycle loss
                         sits in only one total loss, vangan.py:335-336).
- adversarial gen loss:  D applied with stop_gradient'ed *parameters* so the
                         gradient flows through the fake image into the
                         generator only.
- discriminator loss:    D applied to stop_gradient'ed *fakes* so the gradient
                         reaches only D's parameters.

The two D applications per fake share identical RNGs, so their forward values
coincide (and XLA CSEs the computation); their backward halves are exactly the
input-cotangent and parameter-cotangent of the reference's single application.
Exactness vs four independent ``jax.grad`` calls is asserted in
tests/test_train_step.py.

Reference divergences (documented):
- WGAN-GP: the reference computes the penalty *outside* its GradientTape
  (vangan.py:410-415 after the `with` block), so the GP term contributes no
  gradient; and routes both domains through disc_S (vangan.py:370-373). Here
  the GP is inside the differentiated loss and uses the matching
  discriminator.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from vangan_tpu.losses import (
    LossScales,
    cycle_loss,
    cycle_reconstruction,
    cycle_seg_loss,
    discriminator_loss_fn,
    generator_loss_fn,
    gradient_penalty,
    identity_loss,
    wasserstein_discriminator_loss,
    wasserstein_generator_loss,
)
from vangan_tpu.training.state import NETWORKS, VanGanState

Params = Any
sg = jax.lax.stop_gradient


def _sg_tree(tree):
    return jax.tree_util.tree_map(sg, tree)


@dataclass(frozen=True)
class TrainStepFns:
    """Step functions + initializer (pure; caller applies jit/sharding)."""

    init: Callable
    train_step: Callable
    test_step: Callable
    compute_losses: Callable  # exposed for gradient-exactness tests & debugging
    # split-module step (backward_mode='split'): each backward group and the
    # optimizer update compile as SEPARATE XLA modules — same math as
    # 'two_phase', but each module stays under the remote compile helper's
    # memory ceiling (the monolithic ~40-kernel module gets SIGKILLed at
    # 128^3, docs/ROADMAP.md)
    grad_gens: Optional[Callable] = None
    grad_discs: Optional[Callable] = None
    apply_grads: Optional[Callable] = None
    # split-module grads at per-micro loss scales (cfg.micro_batches > 1);
    # consumed by parallel.jit_microbatch_step
    grad_gens_micro: Optional[Callable] = None
    grad_discs_micro: Optional[Callable] = None


def _apply(model, params, model_state, x, train, rng, remat=False, **kwargs):
    """Apply a flax model, threading mutable collections (BN/spectral-norm).

    ``remat=True`` wraps the application in ``jax.checkpoint``: the combined
    backward then recomputes each network's forward instead of holding all ten
    applications' activations live at once — the decisive HBM saving at 128^3
    (a single ResU-Net forward keeps ~1.5 GB of residuals otherwise).

    Layout note: tensors crossing the checkpoint boundary (inputs, outputs and
    their cotangents) get materialised; with a trailing C=1 channel XLA can
    choose a lane-minor layout and pad 1 -> 128 lanes (observed 8 MB -> 1 GB
    copies at 128^3). Folding the singleton channel into Z across the boundary
    keeps the minor dimension 128-sized.
    """
    rngs = {"dropout": jax.random.fold_in(rng, 0), "noise": jax.random.fold_in(rng, 1)}
    mutable = list(model_state.keys()) if (train and model_state) else False
    fold = remat and x.ndim >= 3 and x.shape[-1] == 1

    def pure(p, inp):
        if fold:
            inp = inp[..., None]
        variables = {"params": p, **model_state}
        if mutable:
            y, updates = model.apply(variables, inp, train=train, rngs=rngs, mutable=mutable,
                                     **kwargs)
            new_state = dict(updates)
        else:
            y = model.apply(variables, inp, train=train, rngs=rngs, **kwargs)
            new_state = model_state
        if fold and y.ndim >= 3 and y.shape[-1] == 1:
            y = y[..., 0]
        return y, new_state

    if remat:
        xx = x[..., 0] if fold else x
        y, new_state = jax.checkpoint(pure)(params, xx)
        if fold and y.ndim == x.ndim - 1:
            y = y[..., None]
        return y, new_state
    return pure(params, x)


def make_step_fns(cfg, models: Dict[str, Any], steps_per_epoch: int) -> TrainStepFns:
    """Build init/train/test step functions for the four-network system.

    ``models`` maps NETWORKS names to flax modules (from models.factory).
    The returned functions are pure and jit-friendly; jitting/sharding is
    applied by the caller (vangan.VanGan / parallel.shard_step).
    """
    from vangan_tpu.training.optimizers import make_optimizer

    scales = LossScales(
        global_batch_size=cfg.GLOBAL_BATCH_SIZE,
        n_devices=cfg.N_DEVICES,
        lambda_cycle=cfg.lambda_cycle,
        lambda_identity=cfg.lambda_identity,
        lambda_reconstruction=cfg.lambda_reconstruction,
        lambda_topology=cfg.lambda_topology,
        cldice_iters=cfg.cldice_iters,
        cldice_alpha=cfg.cldice_alpha,
        cldice_groups=cfg.cldice_groups,
        use_pallas_skeleton=bool(getattr(cfg, "use_pallas_skeleton", False)),
    )
    optimizer = make_optimizer(cfg, steps_per_epoch)

    def init(rng: jax.Array) -> VanGanState:
        """Initialise all four networks and optimizer states (vangan.py:86-245)."""
        img_shape = (1, *cfg.subvol_patch_shape)
        seg_shape = (1, *cfg.seg_subvol_patch_shape)
        dummies = {
            "gen_IS": jnp.zeros(img_shape, jnp.float32),
            "gen_SI": jnp.zeros(seg_shape, jnp.float32),
            "disc_I": jnp.zeros(img_shape, jnp.float32),
            "disc_S": jnp.zeros(seg_shape, jnp.float32),
        }
        params, model_state, opt_state = {}, {}, {}
        for i, name in enumerate(NETWORKS):
            variables = models[name].init(
                {"params": jax.random.fold_in(rng, i)}, dummies[name], train=False
            )
            variables = dict(variables)
            params[name] = variables.pop("params")
            model_state[name] = variables  # batch_stats etc., usually {}
            opt_state[name] = optimizer.init(params[name])
        return VanGanState(
            step=jnp.zeros((), jnp.int32), params=params, model_state=model_state,
            opt_state=opt_state,
        )

    def compute_losses(
        params: Dict[str, Params],
        model_state: Dict[str, Any],
        real_I: jnp.ndarray,
        real_S: jnp.ndarray,
        rng: jax.Array,
        noise_std: jnp.ndarray,
        train: bool,
        gp_scale: Optional[jnp.ndarray] = None,
        scales: LossScales = scales,  # microbatch grads pass adjusted scales
        fakes: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        return_fakes: bool = False,
    ):
        """One shared forward of the full CycleGAN graph (vangan.py:270-353),
        with the stop_gradient routing described in the module docstring.
        Returns (combined_scalar_loss, (result_dict, new_model_state)) —
        plus the translated fakes in the aux when ``return_fakes``.

        ``fakes=(fake_I, fake_S)`` substitutes precomputed translations for
        the two leading generator applications. ONLY valid for a pull whose
        gradient subtree is disc-only: the disc branch consumes
        ``stop_gradient(fake)`` (as the reference's ``minimize(var_list=disc
        vars)`` discards generator gradients, vangan.py:433-438), so
        substituting the identical values — same params, same per-step RNGs —
        changes nothing semantically but lets XLA drop the duplicated
        generator forward from the disc gradient module (measured ~100 ms of
        the 128^3 step, docs/PERF.md round-5). A generator pull must NOT pass
        ``fakes``: its gradient flows *through* the fake computation. The
        aux model_state in a ``fakes`` pull is partial (the skipped
        applications contribute no updates) — callers discard it (only the
        first, fakes-free pull materialises state).
        """
        r = {name: jax.random.fold_in(rng, i) for i, name in enumerate(
            ("gIS_a", "gSI_a", "gIS_b", "gSI_b", "dS_r", "dI_r", "dS_f", "dI_f", "gp_I", "gp_S",
             "gIS_id", "gSI_id")
        )}
        new_ms = dict(model_state)

        # A -> B, B -> A (vangan.py:295-297)
        remat = bool(getattr(cfg, "remat", True)) and train
        if fakes is not None:
            fake_I, fake_S = fakes
        else:
            fake_S, new_ms["gen_IS"] = _apply(
                models["gen_IS"], params["gen_IS"], model_state["gen_IS"], real_I, train,
                r["gIS_a"], remat=remat,
            )
            fake_I, new_ms["gen_SI"] = _apply(
                models["gen_SI"], params["gen_SI"], model_state["gen_SI"], real_S, train,
                r["gSI_a"], remat=remat,
            )

        # Cycles (vangan.py:300-308); inner-generator output stopped.
        cycled_S, new_ms["gen_IS"] = _apply(
            models["gen_IS"], params["gen_IS"], new_ms["gen_IS"], sg(fake_I), train, r["gIS_b"],
            remat=remat,
        )
        cycled_I, new_ms["gen_SI"] = _apply(
            models["gen_SI"], params["gen_SI"], new_ms["gen_SI"], sg(fake_S), train, r["gSI_b"],
            remat=remat,
        )

        cycle_loss_I = cycle_loss(scales, real_S, cycled_S, typ=cfg.cycle_loss_I_type)
        seg_loss = cycle_seg_loss(scales, real_S, cycled_S)
        cycle_loss_S = cycle_loss(scales, real_I, cycled_I, typ=cfg.cycle_loss_S_type)
        reconstruction_loss = cycle_reconstruction(scales, real_I, cycled_I)

        # Identity mapping (vangan.py:310-312, commented out there; cfg switch
        # here, default off = reference parity). Term math matches the
        # reference's commented lines exactly — id_IS = identity(real_S,
        # gen_IS(real_S), 'cldice'); id_SI = identity(real_I, gen_SI(real_I),
        # MAE) — but each is routed into its OWN generator's total: the
        # commented composition adds id_SI (a gen_SI term) to total_loss_I,
        # which is minimized w.r.t. gen_IS only, making both terms
        # gradient-dead. Same swapped-naming quirk as the cycle losses
        # (SURVEY §7); keep the math, fix the routing.
        id_IS_loss = id_SI_loss = None
        if getattr(cfg, "use_identity_loss", False):
            same_S, new_ms["gen_IS"] = _apply(
                models["gen_IS"], params["gen_IS"], new_ms["gen_IS"], real_S, train,
                r["gIS_id"], remat=remat,
            )
            same_I, new_ms["gen_SI"] = _apply(
                models["gen_SI"], params["gen_SI"], new_ms["gen_SI"], real_I, train,
                r["gSI_id"], remat=remat,
            )
            typ_IS = None if cfg.identity_loss_IS_type == "mae" else cfg.identity_loss_IS_type
            typ_SI = None if cfg.identity_loss_SI_type == "mae" else cfg.identity_loss_SI_type
            id_IS_loss = identity_loss(scales, real_S, same_S, typ=typ_IS)
            id_SI_loss = identity_loss(scales, real_I, same_I, typ=typ_SI)

        # Discriminator outputs (vangan.py:315-319). Each fake is judged twice
        # with IDENTICAL rngs: once with frozen D params (generator branch) and
        # once with frozen fake (discriminator branch).
        def disc(name, p, x, key):
            y, new_ms[name] = _apply(models[name], p, new_ms[name], x, train, key,
                                     remat=remat, noise_std=noise_std)
            return y

        disc_real_S = disc("disc_S", params["disc_S"], real_S, r["dS_r"])
        disc_real_I = disc("disc_I", params["disc_I"], real_I, r["dI_r"])
        disc_fake_S_gen = disc("disc_S", _sg_tree(params["disc_S"]), fake_S, r["dS_f"])
        disc_fake_S_dis = disc("disc_S", params["disc_S"], sg(fake_S), r["dS_f"])
        disc_fake_I_gen = disc("disc_I", _sg_tree(params["disc_I"]), fake_I, r["dI_f"])
        disc_fake_I_dis = disc("disc_I", params["disc_I"], sg(fake_I), r["dI_f"])

        # Adversarial losses (vangan.py:322-332)
        if cfg.wasserstein:
            gen_IS_loss = wasserstein_generator_loss(scales, disc_fake_S_gen)
            gen_SI_loss = wasserstein_generator_loss(scales, disc_fake_I_gen)
            disc_I_loss = wasserstein_discriminator_loss(scales, disc_real_I, disc_fake_I_dis)
            disc_S_loss = wasserstein_discriminator_loss(scales, disc_real_S, disc_fake_S_dis)
        else:
            gen_IS_loss = generator_loss_fn(scales, disc_fake_S_gen)
            gen_SI_loss = generator_loss_fn(scales, disc_fake_I_gen)
            disc_I_loss = discriminator_loss_fn(scales, disc_real_I, disc_fake_I_dis)
            disc_S_loss = discriminator_loss_fn(scales, disc_real_S, disc_fake_S_dis)

        total_loss_I = gen_IS_loss + cycle_loss_I + seg_loss
        total_loss_S = gen_SI_loss + cycle_loss_S + reconstruction_loss
        if id_IS_loss is not None:
            total_loss_I = total_loss_I + id_IS_loss
            total_loss_S = total_loss_S + id_SI_loss

        disc_I_total, disc_S_total = disc_I_loss, disc_S_loss
        if cfg.wasserstein and gp_scale is not None:
            # WGAN-GP on the matching discriminator (divergence: see module doc).
            # Closures must be side-effect free (they run under an inner
            # jax.grad), so state updates are discarded.
            def d_I(x):
                y, _ = _apply(models["disc_I"], params["disc_I"], new_ms["disc_I"], x, train,
                              r["gp_I"], noise_std=noise_std)
                return y

            def d_S(x):
                y, _ = _apply(models["disc_S"], params["disc_S"], new_ms["disc_S"], x, train,
                              r["gp_S"], noise_std=noise_std)
                return y

            gp_I = gradient_penalty(scales, d_I, real_I, sg(fake_I), r["gp_I"])
            gp_S = gradient_penalty(scales, d_S, real_S, sg(fake_S), r["gp_S"])
            disc_I_total = disc_I_loss + gp_scale * gp_I
            disc_S_total = disc_S_loss + gp_scale * gp_S

        result = {
            "total_IS_loss": total_loss_I,
            "total_SI_loss": total_loss_S,
            "D_I_loss": disc_I_total,
            "D_S_loss": disc_S_total,
            "gen_IS_loss": gen_IS_loss,
            "gen_SI_loss": gen_SI_loss,
            "cycle_gen_SIS_loss": cycle_loss_I,
            "cycle_gen_ISI_loss": cycle_loss_S,
            "seg_loss": seg_loss,
            "reconstruction_loss_I": reconstruction_loss,
        }
        if id_IS_loss is not None:
            result["identity_IS_loss"] = id_IS_loss
            result["identity_SI_loss"] = id_SI_loss
        combined = total_loss_I + total_loss_S + disc_I_total + disc_S_total
        if return_fakes:
            return combined, (result, new_ms, (fake_I, fake_S))
        return combined, (result, new_ms)

    def train_step(
        state: VanGanState,
        real_I: jnp.ndarray,
        real_S: jnp.ndarray,
        rng: jax.Array,
        noise_std: jnp.ndarray,
        update_gen: jnp.ndarray,
    ) -> Tuple[VanGanState, Dict[str, jnp.ndarray]]:
        """One optimization step for all four networks (vangan.py:380-440).

        ``update_gen`` gates the generator updates (WGAN ncritic, vangan.py:400-408);
        the LSGAN path passes True every step (vangan.py:426-431). ``noise_std``
        is the epoch-scheduled discriminator noise σ.
        """
        gp_scale = None
        if cfg.wasserstein:
            # GP active from the second step (initModel flag, vangan.py:410-415)
            gp_scale = jnp.where(state.step > 0, cfg.gp_weight, 0.0)

        step_rng = jax.random.fold_in(rng, state.step)
        mode = getattr(cfg, "backward_mode", "two_phase")
        if mode == "combined":
            groups = [NETWORKS]
        elif mode == "two_phase":
            groups = [("gen_IS", "gen_SI"), ("disc_I", "disc_S")]
        elif mode == "sequential":
            groups = [(n,) for n in NETWORKS]
        else:
            raise ValueError(f"unknown backward_mode {mode!r}")

        if len(groups) == 1:
            # one backward for all four restricted gradients
            grad_fn = jax.grad(compute_losses, argnums=0, has_aux=True)
            grads, (result, new_ms) = grad_fn(
                state.params, state.model_state, real_I, real_S, step_rng, noise_std, True,
                gp_scale,
            )
        else:
            # Grouped backwards chained with optimization barriers. The
            # stop_gradient routing makes grad(combined, params[subset]) the
            # exact restricted gradients, and the groups' path sets are
            # disjoint, so total backward FLOPs match the combined mode — but
            # XLA cannot overlap the groups' backward temporaries, bounding
            # peak HBM (decisive at 128^3 where conv temporaries are 8-16x
            # lane-padded at 16 channels). Each extra group re-runs the shared
            # forward once (remat recompute), trading time for memory:
            # 'two_phase' (gens | discs) is the default sweet spot.
            grads = {}
            carrier = state.params
            result = new_ms = fakes = None
            for group in groups:
                # disc-only pulls reuse the first pull's fakes: their loss
                # consumes stop_gradient(fake), so the identical values let
                # DCE drop the duplicated generator forward (compute_losses
                # docstring; gen pulls must recompute — grads flow through)
                disc_only = fakes is not None and all(n.startswith("disc") for n in group)
                first = result is None

                def loss_for(sub, carrier=carrier, group=group,
                             use_fakes=(fakes if disc_only else None), first=first):
                    full = {**carrier, **{n: sub[n] for n in group}}
                    return compute_losses(full, state.model_state, real_I, real_S, step_rng,
                                          noise_std, True, gp_scale,
                                          fakes=use_fakes, return_fakes=first)

                sub_params = {n: carrier[n] for n in group}
                if result is None:
                    # only the first pull materialises the loss dict / model
                    # state; later pulls return just the scalar so DCE prunes
                    # every forward path not feeding this group's gradient
                    g, (result, new_ms, fakes) = jax.grad(loss_for, has_aux=True)(sub_params)
                else:
                    g = jax.grad(lambda s: loss_for(s)[0])(sub_params)
                grads.update(g)
                carrier, _, fakes = jax.lax.optimization_barrier((carrier, g, fakes))

        new_params, new_opt = {}, {}
        for name in NETWORKS:
            updates, opt_state = optimizer.update(
                grads[name], state.opt_state[name], state.params[name]
            )
            candidate = optax.apply_updates(state.params[name], updates)
            if name.startswith("gen"):
                # gated generator update: parameters and optimizer state only
                # advance when update_gen is set (vangan.py:402-408)
                keep = update_gen
                candidate = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(keep, new, old), candidate, state.params[name]
                )
                opt_state = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(keep, new, old), opt_state, state.opt_state[name]
                )
            new_params[name] = candidate
            new_opt[name] = opt_state

        new_state = state.replace(
            step=state.step + 1, params=new_params, model_state=new_ms, opt_state=new_opt
        )
        return new_state, result

    def test_step(
        state: VanGanState, real_I: jnp.ndarray, real_S: jnp.ndarray, rng: jax.Array
    ) -> Dict[str, jnp.ndarray]:
        """Loss evaluation without gradients (vangan.py:442-457)."""
        _, (result, _) = compute_losses(
            state.params, state.model_state, real_I, real_S, rng,
            jnp.zeros((), jnp.float32), False, None,
        )
        return result

    # --- split-module step (same math as the 'two_phase' groups) ---

    def _gp_scale(step):
        if not cfg.wasserstein:
            return None
        return jnp.where(step > 0, cfg.gp_weight, 0.0)

    def _group_grad(group, first, use_scales=scales):
        disc_only = all(n.startswith("disc") for n in group)

        def fn(params, model_state, step, real_I, real_S, rng, noise_std, fakes=None):
            step_rng = jax.random.fold_in(rng, step)
            use_fakes = fakes if disc_only else None

            def loss_for(sub):
                full = {**params, **{n: sub[n] for n in group}}
                return compute_losses(full, model_state, real_I, real_S, step_rng,
                                      noise_std, True, _gp_scale(step),
                                      scales=use_scales,
                                      fakes=use_fakes, return_fakes=first)

            sub = {n: params[n] for n in group}
            if first:
                # the first pull also hands back the translated fakes so the
                # disc-only module can skip the generator forward entirely
                # (identical values by construction — same params, same
                # step_rng; see compute_losses docstring)
                g, (result, new_ms, fk) = jax.grad(loss_for, has_aux=True)(sub)
                return g, result, new_ms, fk
            return jax.grad(lambda s: loss_for(s)[0])(sub)

        return fn

    grad_gens = _group_grad(("gen_IS", "gen_SI"), first=True)
    grad_discs = _group_grad(("disc_I", "disc_S"), first=False)

    # --- microbatch grads (cfg.micro_batches > 1): the split-module grads at
    # per-micro scales. Per-sample losses and the axis=None quirk stay EXACT
    # when the accumulated micro values are summed (each micro divides by the
    # full GLOBAL_BATCH; the n_devices/micro factor makes the summed
    # reduce_mean_overall quirk come out identical because equal micros
    # partition the batch). clDice evaluates per micro-shard with
    # lambda/micro — the reference's own distributed convention at
    # N_DEVICES x micro replicas (loss_functions.py:226).
    micro = int(getattr(cfg, "micro_batches", 1) or 1)
    grad_gens_micro = grad_discs_micro = None
    if micro > 1:
        import dataclasses

        micro_scales = dataclasses.replace(
            scales,
            n_devices=cfg.N_DEVICES / micro,
            lambda_topology=cfg.lambda_topology / micro,
        )
        grad_gens_micro = _group_grad(("gen_IS", "gen_SI"), first=True,
                                      use_scales=micro_scales)
        grad_discs_micro = _group_grad(("disc_I", "disc_S"), first=False,
                                       use_scales=micro_scales)

    def apply_grads(
        state: VanGanState, grads: Dict[str, Params], new_ms, update_gen: jnp.ndarray
    ) -> VanGanState:
        """Optimizer updates + ncritic gating + step increment (the tail of
        train_step, vangan.py:426-440)."""
        new_params, new_opt = {}, {}
        for name in NETWORKS:
            updates, opt_state = optimizer.update(
                grads[name], state.opt_state[name], state.params[name]
            )
            candidate = optax.apply_updates(state.params[name], updates)
            if name.startswith("gen"):
                keep = update_gen
                candidate = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(keep, new, old), candidate, state.params[name]
                )
                opt_state = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(keep, new, old), opt_state, state.opt_state[name]
                )
            new_params[name] = candidate
            new_opt[name] = opt_state
        return state.replace(
            step=state.step + 1, params=new_params, model_state=new_ms, opt_state=new_opt
        )

    return TrainStepFns(
        init=init, train_step=train_step, test_step=test_step, compute_losses=compute_losses,
        grad_gens=grad_gens, grad_discs=grad_discs, apply_grads=apply_grads,
        grad_gens_micro=grad_gens_micro, grad_discs_micro=grad_discs_micro,
    )
