"""Batched Monte-Carlo Tree Search planner.

TPU-native counterpart of the reference's object-graph MCTS
(`/root/reference/mcts_custom_trainer.py:20-243`). The reference runs
n_simulations × max_depth ≈ 5-10k serial Python ``env.step`` calls per
single real action (SURVEY.md §3.3) — the hottest loop in the repo. Here:

* the tree is a fixed-capacity array soup (visits / value / parent /
  children / untried masks) instead of heap-allocated nodes — the mctx
  pattern — so the whole search jits;
* the environment "clone" is free: env state is an immutable pytree, so a
  simulation just carries its own copy (vs `_copy_env_state`'s manual field
  copy, `mcts_custom_trainer.py:218-243`);
* one ``jax.vmap`` runs an independent search for EVERY env in the batch
  simultaneously — B × n_simulations × max_depth env steps per device call.

Replicated semantics: UCB1 with c=sqrt(2) (`:38-59`), random untried-action
expansion (`:120-125`), rollout policy = 70% least-visited-neighbor
heuristic / 30% uniform (`:168-216`), +500 full-exploration rollout bonus
(`:162-164`), selection rewards NOT backed up (only rollout return is,
`:127-134`), clone resets the completion bonus / collision counters
(a fresh env object in the reference), final action = argmax of
value/max(visits,1) over root children (`:61-68`).

Known benign divergence: exact ties in UCB1/argmax resolve to the lowest
action index instead of Python-dict insertion order.

Two search paths share these semantics:

* :meth:`MCTSPlanner.search` / ``search_batch`` — one XLA program; every
  env-step in selection/rollout is a ``while_loop`` iteration (the
  readable oracle).
* :meth:`MCTSPlanner.search_batch_fused` — batch-major search where the
  simulation env lives PACKED (``rlenv_tpu.ops.fused_step`` layout) for
  the whole search: selection steps run through the fused step kernel and
  the entire rollout phase (the ~90% ablated cost) runs as ONE Pallas
  program per simulation with the 70/30 policy evaluated in-kernel
  (``rlenv_tpu.ops.mcts_rollout``). Same tree rules; the random streams
  differ (kernel randomness is streamed bits), so the two paths agree
  distributionally, not bitwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rlenv_tpu.config import MCTSConfig
from rlenv_tpu.env.core import PlantOS, _ACTION_DELTAS
from rlenv_tpu.env.state import EnvState

_NO_NODE = jnp.int32(-1)


def policy_score_fn(runner):
    """Turn a loaded :class:`rlenv_tpu.apps.policies.PolicyRunner` (DQN or
    A2C; the recurrent PPO policy has episode state and is not usable as a
    stateless rollout prior) into the pure ``obs -> scores`` fn
    :class:`MCTSPlanner` expects. Q-values and actor logits both rank
    actions, which is all the greedy rollout prior needs."""
    if runner.model_type == "dqn":
        return lambda obs: runner.model.apply(runner.params, obs)
    if runner.model_type == "a2c":
        return lambda obs: runner.model.apply(runner.params, obs)[0]
    raise ValueError(
        f"rollout prior needs a stateless policy (dqn/a2c), "
        f"got {runner.model_type!r}")


def value_score_fn(runner):
    """Turn a loaded DQN/A2C checkpoint into the pure ``obs -> V(obs)``
    state-value fn for AlphaZero-style leaf evaluation
    (:class:`MCTSPlanner` ``leaf_value``): a DQN gives
    ``V(s) = max_a Q(s, a)``, an A2C its critic head."""
    if runner.model_type == "dqn":
        return lambda obs: jnp.max(runner.model.apply(runner.params, obs))
    if runner.model_type == "a2c":
        return lambda obs: runner.model.apply(runner.params, obs)[1]
    raise ValueError(
        f"leaf value needs a stateless critic (dqn/a2c), "
        f"got {runner.model_type!r}")


class MCTSPlanner:
    """Model-based planner over the functional PlantOS env (no NN)."""

    def __init__(self, env: PlantOS, config: MCTSConfig = MCTSConfig(),
                 interpret: bool | None = None, rollout_policy=None,
                 leaf_value=None, rollout_policy_layers=None):
        """``rollout_policy``: optional trained prior for the rollout phase
        — a pure fn ``obs[obs_dim] -> scores[num_actions]`` (e.g. a trained
        Q-network's values or an actor's logits; build one from a saved
        checkpoint with :func:`policy_score_fn`). With probability
        ``config.rollout_policy_prob`` each rollout step takes the prior's
        greedy action instead of the reference's 70/30
        least-visited/random draw (`mcts_custom_trainer.py:168-216`);
        under ``vmap`` the per-step policy evaluations batch into
        MXU-shaped matmuls, so guidance is nearly free on TPU.

        ``leaf_value``: optional trained critic ``obs[obs_dim] -> V``
        (build one with :func:`value_score_fn`) for AlphaZero-style leaf
        evaluation: the backup becomes ``(1-mix)*rollout + mix*V(leaf)``
        with ``mix = config.leaf_value_mix``; at mix=1.0 the rollout phase
        is skipped entirely (pure value bootstrap — ~max_depth× fewer env
        steps per simulation).

        ``rollout_policy_layers``: ``([(kernel, bias), ...], activation)``
        — the prior's RAW flax MLP stack (trunk + action head; extract
        with :func:`rlenv_tpu.ops.actor_rollout.qnet_policy_layers` /
        ``actor_critic_policy_layers``). When set, the FUSED search
        (:meth:`search_batch_fused`) evaluates the prior INSIDE the
        rollout kernel (round 5) — the guided search at fused-kernel
        speed; ``leaf_value`` composes with it there too (the kernel
        emits the leaf observation). Without it, guided/value search
        uses the XLA ``search_batch`` path."""
        self.env = env
        self.config = config
        self.rollout_policy = rollout_policy
        self.leaf_value = leaf_value
        self.rollout_policy_layers = rollout_policy_layers
        self._deltas = jnp.asarray(_ACTION_DELTAS[:4])
        # jit-compiled batched search: (EnvState batch, keys[B]) -> actions[B]
        self.search_batch = jax.jit(jax.vmap(self.search))
        # Pallas kernels lower via Mosaic only on TPU; interpret elsewhere.
        self._interpret = interpret
        self._fused_cache: dict = {}

    # -- rollout policy (`mcts_custom_trainer.py:168-216`) -------------------

    def _rollout_action(self, key: jax.Array, state: EnvState,
                        obs: jnp.ndarray) -> jnp.ndarray:
        k_mode, k_rand, k_fallback, k_pol = jax.random.split(key, 4)
        g = self.env.config.grid_size

        neighbors = state.rover[None, :] + self._deltas            # [4, 2]
        in_bounds = jnp.all((neighbors >= 0) & (neighbors < g), axis=-1)
        nx = jnp.clip(neighbors[:, 0], 0, g - 1)
        ny = jnp.clip(neighbors[:, 1], 0, g - 1)
        valid = in_bounds & ~state.obstacles[nx, ny]
        visits = jnp.where(valid, state.visit_counts[nx, ny], jnp.iinfo(jnp.int32).max)
        heur = jnp.where(jnp.any(valid), jnp.argmin(visits),
                         jax.random.randint(k_fallback, (), 0, 5))
        rand = jax.random.randint(k_rand, (), 0, 5)
        use_heur = jax.random.uniform(k_mode) < self.config.rollout_heuristic_prob
        base = jnp.where(use_heur, heur, rand).astype(jnp.int32)
        if self.rollout_policy is None:
            return base
        pol = jnp.argmax(self.rollout_policy(obs)).astype(jnp.int32)
        use_pol = (jax.random.uniform(k_pol)
                   < self.config.rollout_policy_prob)
        return jnp.where(use_pol, pol, base)

    # -- helpers -------------------------------------------------------------

    def _clone_for_sim(self, state: EnvState) -> EnvState:
        """`_copy_env_state` semantics: world + exploration copied, episode
        flags reset to a fresh env's defaults (`mcts_custom_trainer.py:218-243`)."""
        return state.replace(
            completion_bonus_given=jnp.bool_(False),
            collided_with_wall=jnp.bool_(False),
            total_collisions=jnp.int32(0),
        )

    def _ucb_child(self, tree, node):
        """UCB1 over node's existing children (`mcts_custom_trainer.py:38-59`)."""
        kids = tree["children"][node]                     # i32[5]
        exists = kids >= 0
        safe = jnp.maximum(kids, 0)
        cv = tree["visits"][safe].astype(jnp.float32)
        cval = tree["value"][safe]
        pv = tree["visits"][node].astype(jnp.float32)
        ucb = jnp.where(
            cv == 0, jnp.inf,
            cval / jnp.maximum(cv, 1.0)
            + self.config.c_param * jnp.sqrt(jnp.log(jnp.maximum(pv, 1.0))
                                             / jnp.maximum(cv, 1.0)))
        ucb = jnp.where(exists, ucb, -jnp.inf)
        a = jnp.argmax(ucb)
        return kids[a], a

    # -- one full search (single env; vmap for the batch) --------------------

    def search(self, root_state: EnvState, key: jax.Array) -> jnp.ndarray:
        cfg = self.config
        N = cfg.max_nodes

        tree = dict(
            visits=jnp.zeros(N, jnp.int32),
            value=jnp.zeros(N, jnp.float32),
            parent=jnp.full(N, _NO_NODE),
            children=jnp.full((N, 5), _NO_NODE),
            untried=jnp.ones((N, 5), bool),
            count=jnp.int32(1),          # node 0 = root
        )

        def simulation(_, carry):
            tree, key = carry
            key, k_sel, k_expand, k_roll = jax.random.split(key, 4)
            sim = self._clone_for_sim(root_state)

            # --- SELECTION (`mcts_custom_trainer.py:109-117`) ---
            def sel_cond(c):
                node, sim, depth, stop, _ = c
                fully = ~jnp.any(tree["untried"][node])
                has_kids = jnp.any(tree["children"][node] >= 0)
                return fully & has_kids & (depth < cfg.max_depth) & ~stop

            def sel_body(c):
                node, sim, depth, stop, k = c
                child, action = self._ucb_child(tree, node)
                sim, _, _, term, trunc, _ = self.env.step(sim, action)
                return (child, sim, depth + 1, term | trunc, k)

            node, sim, depth, stop, _ = jax.lax.while_loop(
                sel_cond, sel_body,
                (jnp.int32(0), sim, jnp.int32(0), jnp.bool_(False), k_sel))

            # --- EXPANSION (`mcts_custom_trainer.py:120-125`) ---
            untried = tree["untried"][node]
            can_expand = jnp.any(untried) & (depth < cfg.max_depth) & \
                (tree["count"] < N)

            logits = jnp.where(untried, 0.0, -jnp.inf)
            exp_action = jax.random.categorical(k_expand, logits)
            new_idx = tree["count"]

            def do_expand(args):
                tree, sim, node = args
                sim2, _, _, _, _, _ = self.env.step(sim, exp_action)
                tree2 = dict(
                    visits=tree["visits"],
                    value=tree["value"],
                    parent=tree["parent"].at[new_idx].set(node),
                    children=tree["children"].at[node, exp_action].set(new_idx),
                    untried=tree["untried"].at[node, exp_action].set(False),
                    count=tree["count"] + 1,
                )
                return tree2, sim2, new_idx

            tree, sim, node = jax.lax.cond(
                can_expand, do_expand, lambda args: args, (tree, sim, node))

            # --- ROLLOUT (`mcts_custom_trainer.py:139-166`) ---
            def roll_cond(c):
                sim, obs, d, total, stop, k = c
                return (d < cfg.max_depth) & ~stop

            def roll_body(c):
                sim, obs, d, total, stop, k = c
                k, k_act = jax.random.split(k)
                action = self._rollout_action(k_act, sim, obs)
                sim, obs, reward, term, trunc, info = self.env.step(
                    sim, action)
                done = term | trunc
                bonus = jnp.where(
                    done & (info["exploration_percentage"] >= 100.0),
                    cfg.completion_bonus, 0.0)
                return (sim, obs, d + 1, total + reward + bonus, done, k)

            # obs only feeds the optional rollout policy; env.step keeps it
            # current thereafter (XLA drops it when no policy is set).
            obs0 = self.env.observe(sim)
            mix = cfg.leaf_value_mix if self.leaf_value is not None else 0.0
            if mix >= 1.0:
                # Pure value bootstrap: no rollout at all. The reference's
                # +500 full-exploration rollout bonus applies when the
                # LEAF itself is fully explored.
                leaf_info = self.env.get_info(sim)
                bonus = jnp.where(
                    leaf_info["exploration_percentage"] >= 100.0,
                    cfg.completion_bonus, 0.0)
                rollout_return = self.leaf_value(obs0) + bonus
            else:
                _, _, _, rollout_return, _, _ = jax.lax.while_loop(
                    roll_cond, roll_body,
                    (sim, obs0, depth, jnp.float32(0), jnp.bool_(False),
                     k_roll))
                if mix > 0.0:
                    rollout_return = ((1.0 - mix) * rollout_return
                                      + mix * self.leaf_value(obs0))

            # --- BACKPROP (`mcts_custom_trainer.py:131-134`) ---
            def bp_cond(c):
                n, _, _ = c
                return n >= 0

            def bp_body(c):
                n, visits, value = c
                return (tree["parent"][n], visits.at[n].add(1),
                        value.at[n].add(rollout_return))

            _, visits, value = jax.lax.while_loop(
                bp_cond, bp_body, (node, tree["visits"], tree["value"]))
            tree = dict(tree, visits=visits, value=value)
            return tree, key

        tree, key = jax.lax.fori_loop(0, cfg.n_simulations, simulation,
                                      (tree, key))

        # --- final decision (`mcts_custom_trainer.py:61-68`) ---
        kids = tree["children"][0]
        exists = kids >= 0
        safe = jnp.maximum(kids, 0)
        mean_value = tree["value"][safe] / jnp.maximum(
            tree["visits"][safe].astype(jnp.float32), 1.0)
        mean_value = jnp.where(exists, mean_value, -jnp.inf)
        best = jnp.argmax(mean_value).astype(jnp.int32)
        random_action = jax.random.randint(key, (), 0, 5)
        return jnp.where(jnp.any(exists), best, random_action)

    # -- fused batch search (Pallas kernels, batch-major tree) ---------------

    def search_batch_fused(self, root_states: EnvState,
                           key: jax.Array) -> jnp.ndarray:
        """Batched search with the sim env packed and the rollout phase run
        as one Pallas program per simulation. Same tree semantics as
        :meth:`search`; takes ONE key (randomness is drawn batch-wide).

        2x faster than ``search_batch`` on TPU at the reference planner
        config (206 ms vs 414 ms per 256-env batched search,
        runs/mcts_bench_r2.log) — and ~52-61x for GUIDED/leaf-value
        search (round 5: the prior's MLP runs in the rollout kernel, the
        leaf obs is kernel-emitted; RESULTS.md). The rollout while_loop
        collapses into one kernel launch per simulation, leaving the
        per-simulation selection/backprop tree ops as the remaining
        cost."""
        B = root_states.rover.shape[0]
        if B not in self._fused_cache:
            self._fused_cache[B] = self._build_fused_search(B)
        return self._fused_cache[B](root_states, key)

    def _build_fused_search(self, B: int):
        from rlenv_tpu.ops.fused_step import (_SC_BONUS, _SC_COLLIDED,
                                              _SC_COLLISIONS, _SC_DONE,
                                              FlatEnvState, build_fused_step,
                                              pack_state)
        from rlenv_tpu.ops.mcts_rollout import _SC_ROLLD, build_mcts_rollout

        cfg = self.config
        env = self.env
        g = env.config.grid_size
        N = cfg.max_nodes
        K = cfg.max_depth
        interpret = self._interpret
        if interpret is None:
            dev = jax.devices()[0]
            interpret = not ("tpu" in dev.platform.lower()
                             or "tpu" in dev.device_kind.lower())
        step = build_fused_step(env.config, B, block_envs=min(256, B),
                                interpret=interpret)
        # Guided rollouts / leaf values run IN the fused path (round 5):
        # the rollout kernel evaluates the prior's MLP on the in-kernel
        # observation, and emits the leaf observation for the value mix.
        guided = self.rollout_policy_layers is not None
        use_leaf = self.leaf_value is not None and cfg.leaf_value_mix > 0
        if guided:
            from rlenv_tpu.ops.actor_rollout import pack_mlp_policy
            layers, activation = self.rollout_policy_layers
            g_ws, g_bs = pack_mlp_policy(env.config, layers)
        else:
            g_ws, g_bs, activation = (), (), "relu"
        mix = cfg.leaf_value_mix if use_leaf else 0.0
        # Pure value bootstrap (mix >= 1): the rollout's returns are
        # never consumed, so build a 1-step leaf-obs-only kernel instead
        # of running (and discarding) max_depth transitions per
        # simulation — the XLA path's "~max_depth x fewer env steps".
        pure_value = use_leaf and mix >= 1.0
        if pure_value:
            guided, g_ws, g_bs = False, (), ()
        K_roll = 1 if pure_value else K
        roll = build_mcts_rollout(
            env.config, B, K_roll,
            heuristic_prob=cfg.rollout_heuristic_prob,
            completion_bonus=cfg.completion_bonus,
            block_envs=min(256, B), interpret=interpret,
            guided_layers=len(g_ws),
            guided_prob=cfg.rollout_policy_prob if guided else 0.0,
            guided_activation=activation,
            emit_leaf_obs=use_leaf)
        n_rand = 4 if guided else 3
        v_leaf = (jax.vmap(self.leaf_value) if use_leaf else None)
        # AlphaZero-style PUCT selection (config docstring): prior over a
        # node's children = softmax of the trained policy's scores on the
        # node's OWN observation, captured free at expansion (the step
        # kernel emits the stepped-to state's obs).
        use_puct = cfg.puct_c > 0 and self.rollout_policy is not None
        bidx = jnp.arange(B)

        def select_flat(mask, new, old):
            return FlatEnvState(
                rolled=jnp.where(mask[:, None], new.rolled, old.rolled),
                scal=jnp.where(mask[:, None], new.scal, old.scal),
                key=old.key)

        def ucb_children(tree, node):
            """Batched `_ucb_child` (`mcts_custom_trainer.py:38-59`);
            PUCT scoring instead when ``cfg.puct_c > 0``."""
            kids = tree["children"][bidx, node]            # [B, 5]
            exists = kids >= 0
            safe = jnp.maximum(kids, 0)
            cv = tree["visits"][bidx[:, None], safe].astype(jnp.float32)
            cval = tree["value"][bidx[:, None], safe]
            pv = tree["visits"][bidx, node].astype(jnp.float32)[:, None]
            if use_puct:
                q = jnp.where(cv > 0, cval / jnp.maximum(cv, 1.0), 0.0)
                pri = tree["prior"][bidx, node]            # [B, 5]
                ucb = q + cfg.puct_c * pri * (
                    jnp.sqrt(jnp.maximum(pv, 1.0)) / (1.0 + cv))
                ucb = jnp.where(exists, ucb, -jnp.inf)
                a = jnp.argmax(ucb, axis=-1).astype(jnp.int32)
                return kids[bidx, a], a
            ucb = jnp.where(
                cv == 0, jnp.inf,
                cval / jnp.maximum(cv, 1.0)
                + cfg.c_param * jnp.sqrt(jnp.log(jnp.maximum(pv, 1.0))
                                         / jnp.maximum(cv, 1.0)))
            ucb = jnp.where(exists, ucb, -jnp.inf)
            a = jnp.argmax(ucb, axis=-1).astype(jnp.int32)
            return kids[bidx, a], a

        def search(root_states: EnvState, key: jax.Array) -> jnp.ndarray:
            flat_root = pack_state(root_states, g)
            # `_clone_for_sim` semantics: episode flags reset to a fresh
            # env's defaults (`mcts_custom_trainer.py:218-243`).
            scal = flat_root.scal
            for col in (_SC_BONUS, _SC_COLLIDED, _SC_COLLISIONS,
                        _SC_DONE, _SC_ROLLD):
                scal = scal.at[:, col].set(0)
            flat_root = flat_root.replace(scal=scal)

            tree = dict(
                visits=jnp.zeros((B, N), jnp.int32),
                value=jnp.zeros((B, N), jnp.float32),
                parent=jnp.full((B, N), _NO_NODE),
                children=jnp.full((B, N, 5), _NO_NODE),
                untried=jnp.ones((B, N, 5), bool),
                count=jnp.ones((B,), jnp.int32),          # node 0 = root
            )
            if use_puct:
                root_prior = jax.nn.softmax(
                    self.rollout_policy(jax.vmap(env.observe)(root_states))
                    / cfg.puct_prior_temp, axis=-1)       # [B, 5]
                tree["prior"] = jnp.full(
                    (B, N, 5), 0.2).at[:, 0].set(root_prior)

            def simulation(_, carry):
                tree, key = carry
                key, k_exp, k_roll = jax.random.split(key, 3)
                rand = jax.lax.bitcast_convert_type(
                    jax.random.bits(k_roll, (K_roll, n_rand, B),
                                    jnp.uint32), jnp.int32)

                # --- SELECTION (tree fixed; all B lanes masked) ---
                def active_mask(node, depth, stop):
                    fully = ~jnp.any(tree["untried"][bidx, node], axis=-1)
                    has_kids = jnp.any(tree["children"][bidx, node] >= 0,
                                       axis=-1)
                    return fully & has_kids & (depth < K) & ~stop

                def sel_cond(c):
                    node, flat, depth, stop = c
                    return jnp.any(active_mask(node, depth, stop))

                def sel_body(c):
                    node, flat, depth, stop = c
                    act = active_mask(node, depth, stop)
                    child, action = ucb_children(tree, node)
                    nf, _, _, term, trunc, _ = step(flat, action)
                    flat = select_flat(act, nf, flat)
                    node = jnp.where(act, child, node)
                    depth = depth + act.astype(jnp.int32)
                    stop = stop | (act & (term | trunc))
                    return (node, flat, depth, stop)

                node, flat, depth, stop = jax.lax.while_loop(
                    sel_cond, sel_body,
                    (jnp.zeros(B, jnp.int32), flat_root,
                     jnp.zeros(B, jnp.int32), jnp.zeros(B, bool)))

                # --- EXPANSION ---
                untried_n = tree["untried"][bidx, node]    # [B, 5]
                any_untried = jnp.any(untried_n, axis=-1)
                can = any_untried & (depth < K) & (tree["count"] < N)
                logits = jnp.where(untried_n, 0.0, -jnp.inf)
                logits = jnp.where(any_untried[:, None], logits, 0.0)
                exp_a = jax.random.categorical(k_exp, logits
                                               ).astype(jnp.int32)
                nf, exp_obs, _, _, _, _ = step(flat, exp_a)
                flat = select_flat(can, nf, flat)
                new_idx = jnp.minimum(tree["count"], N - 1)
                parent = tree["parent"].at[bidx, new_idx].set(
                    jnp.where(can, node, tree["parent"][bidx, new_idx]))
                children = tree["children"].at[bidx, node, exp_a].set(
                    jnp.where(can, new_idx,
                              tree["children"][bidx, node, exp_a]))
                untried = tree["untried"].at[bidx, node, exp_a].set(
                    jnp.where(can, False,
                              tree["untried"][bidx, node, exp_a]))
                tree = dict(
                    tree,
                    parent=parent, children=children, untried=untried,
                    count=tree["count"] + can.astype(jnp.int32))
                if use_puct:
                    # the step kernel already emitted the NEW node's obs
                    new_prior = jax.nn.softmax(
                        self.rollout_policy(exp_obs)
                        / cfg.puct_prior_temp, axis=-1)   # [B, 5]
                    tree["prior"] = tree["prior"].at[bidx, new_idx].set(
                        jnp.where(can[:, None], new_prior,
                                  tree["prior"][bidx, new_idx]))
                node = jnp.where(can, new_idx, node)

                # --- ROLLOUT: one Pallas program for the whole phase
                # (policy-guided in-kernel when a prior is set) ---
                if pure_value:
                    # K_roll=1 obs-only kernel; its 1-step returns are
                    # discarded. XLA-path semantics: the +500 rollout
                    # bonus applies when the LEAF itself is fully
                    # explored.
                    from rlenv_tpu.ops.fused_step import (_SC_EXPLORED,
                                                          _SC_FREE)
                    _, leaf_obs = roll(flat, depth, rand)
                    fully = (flat.scal[:, _SC_EXPLORED]
                             >= flat.scal[:, _SC_FREE])
                    returns = v_leaf(leaf_obs) + jnp.where(
                        fully, cfg.completion_bonus, 0.0)
                elif use_leaf:
                    returns, leaf_obs = roll(flat, depth, rand, g_ws, g_bs)
                    returns = ((1.0 - mix) * returns
                               + mix * v_leaf(leaf_obs))
                else:
                    returns = roll(flat, depth, rand, g_ws, g_bs)  # [B]

                # --- BACKPROP ---
                def bp_cond(c):
                    return jnp.any(c[0] >= 0)

                def bp_body(c):
                    n, visits, value = c
                    act = n >= 0
                    ns = jnp.maximum(n, 0)
                    visits = visits.at[bidx, ns].add(act.astype(jnp.int32))
                    value = value.at[bidx, ns].add(
                        jnp.where(act, returns, 0.0))
                    n = jnp.where(act, parent[bidx, ns], n)
                    return (n, visits, value)

                _, visits, value = jax.lax.while_loop(
                    bp_cond, bp_body, (node, tree["visits"], tree["value"]))
                return dict(tree, visits=visits, value=value), key

            tree, key = jax.lax.fori_loop(0, cfg.n_simulations, simulation,
                                          (tree, key))

            # --- final decision (`mcts_custom_trainer.py:61-68`) ---
            kids = tree["children"][:, 0, :]               # [B, 5]
            exists = kids >= 0
            safe = jnp.maximum(kids, 0)
            mean_value = (tree["value"][bidx[:, None], safe]
                          / jnp.maximum(tree["visits"][bidx[:, None], safe]
                                        .astype(jnp.float32), 1.0))
            mean_value = jnp.where(exists, mean_value, -jnp.inf)
            best = jnp.argmax(mean_value, axis=-1).astype(jnp.int32)
            random_action = jax.random.randint(key, (B,), 0, 5)
            return jnp.where(jnp.any(exists, axis=-1), best, random_action)

        return jax.jit(search)
