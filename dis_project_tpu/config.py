"""Config / flag system.

The reference has no configuration surface at all — every knob is a
hard-coded constructor literal and runs are varied by editing source
(SURVEY.md §5, reference ``src/main.py:32-54``, ``Instructions.md``). Here a
single dataclass covers the whole run matrix (replicate mode, gene-subset
ablations, clamp toggle, optimiser, precision, mesh shape) with a real
argparse CLI, and maps 1:1 onto the five BASELINE.json configs.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional, Sequence


@dataclasses.dataclass
class RunConfig:
    # preset: maps 1:1 onto the five BASELINE.json configs.
    #   p53          — canonical single-replicate exact pipeline (config 1)
    #   p53-replicates — all-replicate / ablation runs (config 2)
    #   alfi-parity  — cross-framework torch validation run (config 3)
    #   dense10k     — synthetic 50x200 exact GP stress run (config 4)
    #   sparse100k   — synthetic N=1e5 sparse variational run (config 5)
    preset: str = "p53"
    # model family: simm (first-order exact) | simm2 (second-order exact)
    # | multisimm (first-order exact with R independent latent forces)
    # | nlfm (first-order with a NONLINEAR response g(f): MAP + Laplace)
    # | delaysimm (first-order exact with per-gene transcriptional delays)
    model: str = "simm"
    # multisimm route: number of latent forces
    num_forces: int = 2
    # nlfm route: response nonlinearity and quadrature grid size
    response: str = "exp"
    num_quad: int = 97
    # data
    replicate: Optional[int] = 0  # None = all three replicates
    selected_genes: Optional[Sequence[str]] = None
    data_dir: str = "data"
    data_source: str = "auto"  # auto | csv | synthetic
    seed: int = 0
    # synthetic stress-config shape (dense10k / sparse100k presets)
    synth_genes: int = 50
    synth_timepoints: int = 200
    # sparse variational settings (sparse100k preset)
    num_inducing: int = 128
    batch_size: int = 2048
    num_epochs: int = 25
    # dense-preset MLL engine: cholesky (exact) | cg (matmul-only BBMM —
    # unbiased stochastic logdet/gradients, O(N^2 * iters))
    mll_engine: str = "cholesky"
    # state-space engine: split the TIME axis of the Kalman filter over
    # every visible device (sequence parallelism; requires --mll-engine ss)
    ss_shard: bool = False
    # state-space engine force prior: 'rbf' (the reference-consistent
    # prior, order-10 SDE approximation) or an EXACT Matern
    # ('matern12'/'matern32'/'matern52') the dense closed forms cannot
    # express (requires --mll-engine ss)
    force_kernel: str = "rbf"
    # state-space engine: freeze the Kalman gain at the DARE fixed point
    # after K exact warmup steps — each remaining step drops its
    # covariance leg (measured 5.6-10x at T=5e4; error geometric in K,
    # 9.3e-8 relative at K=4096/T=5e4). Requires --mll-engine ss on a
    # uniform-grid family (simm/simm2/multisimm)
    stationary_after: Optional[int] = None
    # sparse path: data-parallel SVI — shard each minibatch's ROW axis over
    # every visible device (per-device ELBO shards, psum'd grads; requires
    # --preset sparse100k)
    dp_shard: bool = False
    # model. None = path default: 1e-4 for the exact paths (reference
    # src/main.py:41), 1e-6 for the sparse path (tighter; SparseSIMM applies
    # its own f32 Kuu floor). A user-passed --jitter is honored by BOTH —
    # the old sentinel-compare silently remapped an explicit 1e-4 (ADVICE r1).
    jitter: Optional[float] = None
    legacy_block_mean: bool = False
    # tie B/S/D across genes (shared-vs-per-gene kinetics ablation)
    shared_kinetics: bool = False
    # training (reference canonical run: adam lr=0.01, 150 iters, f64)
    num_iters: int = 150
    learning_rate: float = 0.01
    optimizer: str = "adam"
    fix_params: bool = True
    num_steps_per_epoch: int = 1000
    track_parameters: bool = False
    # canonical route: HMC posterior draws over the hyperparameters after
    # training (0 = off); seeds the chain at the trained point
    posterior_samples: int = 0
    # number of independent HMC chains (vmapped into one program); > 1
    # additionally reports split-R-hat / ESS convergence diagnostics
    posterior_chains: int = 1
    # precision
    x64: bool = True
    # backend: None = auto (x64 parity runs go to CPU — TPUs emulate f64
    # painfully slowly; f32 runs use the default accelerator)
    platform: Optional[str] = None
    # parallel
    mesh_shape: Optional[Sequence[int]] = None  # e.g. (4, 2)
    mesh_axes: Sequence[str] = ("data", "model")
    # p53-replicates preset: train one model PER replicate as a mesh
    # ensemble (one SPMD program) instead of one joint all-replicate model
    ensemble: bool = False
    # reporting
    out_dir: str = "plots"
    save_name: Optional[str] = None
    checkpoint_dir: Optional[str] = None
    resume: bool = False
    metrics_path: Optional[str] = None  # JSONL per-step metrics

    @property
    def exact_jitter(self) -> float:
        """--jitter, or the exact-path default 1e-4 when not given."""
        return self.jitter if self.jitter is not None else 1e-4

    @property
    def sparse_jitter(self) -> float:
        """--jitter, or the sparse-path default 1e-6 when not given."""
        return self.jitter if self.jitter is not None else 1e-6


def add_cli_args(parser: argparse.ArgumentParser) -> None:
    d = RunConfig()
    parser.add_argument("--preset", default=d.preset,
                        choices=["p53", "p53-replicates", "alfi-parity",
                                 "dense10k", "sparse100k"],
                        help="one of the five BASELINE configs")
    parser.add_argument("--model", default=d.model,
                        choices=["simm", "simm2", "multisimm", "nlfm",
                                 "delaysimm"],
                        help="model family: first-order, second-order, "
                        "multi-force first-order, nonlinear-response, or "
                        "delayed-response first-order ODE LFM")
    parser.add_argument("--num-forces", type=int, default=d.num_forces,
                        help="multisimm route: number of independent "
                        f"latent forces (default {d.num_forces})")
    parser.add_argument("--response", default=d.response,
                        choices=["identity", "exp", "softplus", "sigmoid"],
                        help="nlfm route: response nonlinearity g(f) "
                        "(default exp — Lawrence et al. 2006 s5's "
                        "positivity-constrained model)")
    parser.add_argument("--num-quad", type=int, default=d.num_quad,
                        help="nlfm route: force quadrature grid size "
                        f"(default {d.num_quad})")
    # Default None so presets can pick their own shape: sparse100k alone
    # must reproduce BASELINE config 5 (100x1000 -> N=1e5; ADVICE r1).
    parser.add_argument("--synth-genes", type=int, default=None,
                        help=f"synthetic gene count (default {d.synth_genes}; "
                        "sparse100k preset: 100)")
    parser.add_argument("--synth-timepoints", type=int, default=None,
                        help=f"synthetic timepoint count (default "
                        f"{d.synth_timepoints}; sparse100k preset: 1000)")
    parser.add_argument("--num-inducing", type=int, default=d.num_inducing)
    parser.add_argument("--batch-size", type=int, default=d.batch_size)
    parser.add_argument("--num-epochs", type=int, default=d.num_epochs)
    parser.add_argument("--mll-engine", default=d.mll_engine,
                        choices=["cholesky", "cg", "dist", "ss"],
                        help="dense-preset MLL engine: 'cholesky' "
                        "(single-device blocked factoriser, O(N^3)), 'cg' "
                        "(matmul-only BBMM/Lanczos), 'dist' (row-sharded "
                        "GSPMD Cholesky over ALL visible devices — the "
                        "beyond-HBM path, exercised on a 1-device mesh "
                        "when only one chip is visible), 'ss' (state-space "
                        "Kalman engine, O(T) in timepoints via an order-10 "
                        "SDE approximation of the force prior — ~1e-4 MLL "
                        "accuracy, log-depth associative-scan filter on "
                        "TPU)")
    parser.add_argument("--ss-shard", action="store_true",
                        help="state-space engine: run the temporally-"
                        "sharded filter — the time axis split over every "
                        "visible device, local associative scans, one "
                        "all-gather of chunk composites (exact; requires "
                        "--mll-engine ss)")
    parser.add_argument("--force-kernel", default=d.force_kernel,
                        choices=["rbf", "matern12", "matern32", "matern52"],
                        help="state-space engine force prior: 'rbf' "
                        "(reference-consistent, order-10 SDE "
                        "approximation) or an EXACT Matern family the "
                        "closed-form dense Gram cannot express (requires "
                        "--mll-engine ss, first-order simm route)")
    parser.add_argument("--stationary-after", type=int,
                        default=d.stationary_after,
                        help="state-space engine: freeze the Kalman gain "
                        "after this many exact warmup steps (steady-state "
                        "filter; measured 5.6-10x at T=5e4 with error "
                        "geometric in the warmup — requires --mll-engine "
                        "ss on simm/simm2/multisimm)")
    parser.add_argument("--dp-shard", action="store_true",
                        help="sparse path: data-parallel SVI — each "
                        "minibatch's row axis sharded over every visible "
                        "device (per-device ELBO shards, psum'd grads; "
                        "identical trajectory to the single-device run; "
                        "requires --preset sparse100k)")
    parser.add_argument("--ensemble", action="store_true",
                        help="p53-replicates: per-replicate model ensemble "
                        "as one SPMD mesh program")
    parser.add_argument("--mesh-shape", type=str, default=None,
                        help="device mesh shape, e.g. 4,2 (data,model)")
    parser.add_argument("--replicate", type=str, default="0",
                        help="replicate index 0-2, or 'all'")
    parser.add_argument("--genes", type=str, default=None,
                        help="comma-separated gene subset, e.g. p21,DDB2")
    parser.add_argument("--data-dir", default=d.data_dir)
    parser.add_argument("--data-source", default=d.data_source,
                        choices=["auto", "csv", "synthetic"])
    parser.add_argument("--seed", type=int, default=d.seed)
    parser.add_argument("--jitter", type=float, default=d.jitter,
                        help="diagonal jitter (default: 1e-4 exact paths, "
                        "1e-6 sparse path)")
    # Default None so model families can pick their own count: the exact
    # routes use the reference's 150 Adam steps, but nlfm's MAP is over
    # (kinetics, Q force values) and needs ~2000.
    parser.add_argument("--num-iters", type=int, default=None,
                        help=f"optimisation steps (default {d.num_iters}; "
                        "nlfm route: 2000)")
    parser.add_argument("--learning-rate", type=float, default=d.learning_rate)
    parser.add_argument("--optimizer", default=d.optimizer,
                        choices=["adam", "lbfgs"])
    parser.add_argument("--no-fix-params", action="store_true",
                        help="disable the p21 identifiability clamp")
    parser.add_argument("--shared-kinetics", action="store_true",
                        help="tie basal/sensitivity/decay across genes "
                        "(ablation; implies --no-fix-params)")
    parser.add_argument("--steps-per-epoch", type=int, default=d.num_steps_per_epoch)
    parser.add_argument("--track-parameters", action="store_true")
    parser.add_argument("--posterior-samples", type=int,
                        default=d.posterior_samples,
                        help="after training, draw this many HMC posterior "
                        "samples over the hyperparameters (exact-MLL "
                        "likelihood, flat prior in constrained space) and "
                        "report credible intervals for the kinetics")
    parser.add_argument("--posterior-chains", type=int,
                        default=d.posterior_chains,
                        help="independent HMC chains, vmapped into one "
                        "program (> 1 adds split-R-hat / ESS convergence "
                        f"diagnostics; default {d.posterior_chains})")
    parser.add_argument("--no-x64", action="store_true",
                        help="run in f32 (TPU-native precision)")
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"],
                        help="force a JAX backend (default: auto — x64 runs "
                        "prefer CPU since TPUs emulate f64)")
    parser.add_argument("--out-dir", default=d.out_dir)
    parser.add_argument("--save-name", default=None)
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint in "
                        "--checkpoint-dir (params + optimizer state)")
    parser.add_argument("--metrics-path", default=None)


def config_from_args(args: argparse.Namespace) -> RunConfig:
    replicate = None if args.replicate == "all" else int(args.replicate)
    genes = args.genes.split(",") if args.genes else None
    return RunConfig(
        preset=args.preset,
        model=args.model,
        num_forces=args.num_forces,
        response=args.response,
        num_quad=args.num_quad,
        synth_genes=(
            args.synth_genes
            if args.synth_genes is not None
            else (100 if args.preset == "sparse100k" else RunConfig.synth_genes)
        ),
        synth_timepoints=(
            args.synth_timepoints
            if args.synth_timepoints is not None
            else (
                1000
                if args.preset == "sparse100k"
                else RunConfig.synth_timepoints
            )
        ),
        num_inducing=args.num_inducing,
        batch_size=args.batch_size,
        num_epochs=args.num_epochs,
        mll_engine=args.mll_engine,
        ss_shard=args.ss_shard,
        force_kernel=args.force_kernel,
        stationary_after=args.stationary_after,
        dp_shard=args.dp_shard,
        ensemble=args.ensemble,
        mesh_shape=(
            tuple(int(v) for v in args.mesh_shape.split(","))
            if args.mesh_shape
            else None
        ),
        replicate=replicate,
        selected_genes=genes,
        data_dir=args.data_dir,
        data_source=args.data_source,
        seed=args.seed,
        jitter=args.jitter,
        shared_kinetics=args.shared_kinetics,
        num_iters=(
            args.num_iters
            if args.num_iters is not None
            else (2000 if args.model == "nlfm" else RunConfig.num_iters)
        ),
        learning_rate=args.learning_rate,
        optimizer=args.optimizer,
        fix_params=not args.no_fix_params,
        num_steps_per_epoch=args.steps_per_epoch,
        track_parameters=args.track_parameters,
        posterior_samples=args.posterior_samples,
        posterior_chains=args.posterior_chains,
        x64=not args.no_x64,
        platform=args.platform,
        out_dir=args.out_dir,
        save_name=args.save_name,
        checkpoint_dir=args.checkpoint_dir,
        resume=args.resume,
        metrics_path=args.metrics_path,
    )
