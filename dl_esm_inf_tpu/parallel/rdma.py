"""Shared building blocks of the remote-DMA transports.

Both Pallas exchange kernels — the standalone block exchange
(:mod:`.halo_pallas`) and the fused-sweep transport
(:mod:`..ops.sweep` ``exchange_spec``) — need the same two subtle
pieces, kept in ONE place so a fix cannot silently miss a copy:

* the **x-phase lane-block geometry**: Mosaic rejects DMA slices whose
  lane width is not a multiple of the 128-lane tiling (measured on
  v5e), including a "full-width" slice of a lane-padded buffer, so
  narrow column strips cannot be DMA'd — the x phase ships whole
  WB-lane column blocks into peer VMEM landing buffers and merges the
  halo columns in compute;
* the **readiness fence**: per-(phase, direction) counting semaphores,
  where each wait consumes exactly one signal, so a wait can only ever
  be satisfied by a signal of its own phase+direction — a skewed
  neighbour's y-phase (or next-call x-phase) signal cannot release an
  x-phase wait early, and counting semantics buffer arbitrary
  multi-call skew;
* the **entry barrier**: the fence semaphores are REGULAR *scratch*
  semaphores, so a fence signal is only meaningful while the peer is
  inside the SAME kernel — if a skewed peer were still inside a
  *different* Pallas kernel (a standalone exchange interleaved with a
  fused sweep, say), the signal would land on whatever that kernel's
  scratch allocation put at the address: silent corruption.
  :func:`entry_barrier` closes the hazard with the system BARRIER
  semaphore (a per-``collective_id`` global resource, valid no matter
  what the peer is running): each device signals every exchange
  neighbour's barrier semaphore and waits for one signal per
  neighbour before any fence traffic.  A peer's fence signals are sent
  only after ITS barrier completes, which needs THIS device's
  barrier signal — sent from inside this kernel — so fence signals
  only ever fly between devices that have both entered it.  Each
  distinct remote-DMA kernel must carry a distinct ``collective_id``
  (see :data:`COLLECTIVE_ID_EXCHANGE` / :data:`COLLECTIVE_ID_SWEEP`).

MAINTENANCE NOTE — the phase BODIES are deliberately twin-coded, not
shared: :mod:`.halo_pallas` (standalone, out_hbm target, unconditional
restores) and :mod:`..ops.sweep` ``run_exchange`` (fused, aliased
input target, y-phase only *started* so tiles overlap it) integrate
into different pipelines and their bodies cannot be one function
without parameterising away exactly the scheduling differences that
make the fused path fast.  What CAN drift silently is centralised
here (geometry, fence, barrier, ids).  When touching either phase
body, diff it against its twin:
``halo_pallas.py kernel`` x/y phases <-> ``sweep.py run_exchange``.
"""
from __future__ import annotations

LANES = 128  # Mosaic lane tiling (f32/i32)

# Distinct per-kernel barrier-semaphore ids (see module docstring):
# kernels that may interleave on a mesh MUST NOT share one.
COLLECTIVE_ID_EXCHANGE = 1   # parallel/halo_pallas.py standalone exchange
COLLECTIVE_ID_SWEEP = 2      # ops/sweep.py fused-transport sweep


def col_block_geometry(lx: int, strips: dict, interpret: bool,
                       context: str):
    """(WB, {name: (block_start, strip_offset)}) for column strips.

    ``strips``: name -> (col_start, width).  Each strip must fit in one
    WB-lane block whose start is a multiple of WB (clamped to lx-WB);
    when compiling (not interpret) with lx > 128, lx must be a multiple
    of 128 — Mosaic's DMA lane rules."""
    WB = min(LANES, lx)
    geo = {}
    bad = []
    for name, (c0, d) in strips.items():
        blk = min((c0 // WB) * WB, lx - WB)
        off = c0 - blk
        geo[name] = (blk, off)
        if off + d > WB:
            bad.append(name)
    if not interpret and lx > LANES and (lx % LANES or bad):
        raise ValueError(
            f"{context}: the x exchange needs {LANES}-lane-aligned "
            f"column blocks — local_nx={lx} must be a multiple of "
            f"{LANES} with each edge strip within one block "
            f"(misfits: {bad or 'none'}); decompose with align=128")
    return WB, geo


def colblk_fn(ref_width: int, WB: int, lead: int = 0):
    """ref -> WB-lane column-block sub-ref at a block start.

    When WB spans the whole width, returns the UN-sliced ref: Mosaic
    rejects a full-width lane slice of a lane-padded buffer just like a
    narrow one.  ``lead`` leading axes (e.g. a multi-level field's level
    axis) are carried whole."""
    from jax.experimental import pallas as pl

    def colblk(ref, c0):
        if WB == ref_width:
            return ref
        return ref.at[(slice(None),) * (lead + 1) + (pl.ds(c0, WB),)]

    return colblk


def entry_barrier(id_type, peer_id, interpret: bool, peers):
    """Cross-kernel safety barrier at remote-DMA kernel entry (see the
    module docstring).  ``peers`` is the list of exchange-neighbour
    coordinate dicts (plus+minus per active phase, wrap-indexed like the
    fence, so edge devices stay SPMD-symmetric).  Interpret mode runs
    devices in lock-step (and cannot lower the barrier semaphore), so
    like the fence it is compiled-mode only."""
    from jax.experimental.pallas import tpu as pltpu

    if interpret or not peers:
        return
    sem = pltpu.get_barrier_semaphore()
    for p in peers:
        pltpu.semaphore_signal(sem, inc=1, device_id=peer_id(p),
                               device_id_type=id_type)
    pltpu.semaphore_wait(sem, len(peers))


def make_fence(ready_sems, id_type, peer_id, interpret: bool):
    """The per-(phase, direction) readiness fence (see module
    docstring).  ``ready_sems`` is a REGULAR((2, 2)) semaphore scratch
    indexed [phase, direction]; ``peer_id`` maps a mesh-coordinate dict
    to the form the device-id type expects.  I will write into my
    plus-side peer, so it must tell ME it is ready: it signals my
    [phase, 0] slot, the minus-side peer signals [phase, 1];
    symmetrically I signal plus's [phase, 1] and minus's [phase, 0].
    Interpret mode executes devices in lock-step with synchronous
    delivery (and cannot lower remote semaphore signals), so the fence
    is compiled-mode only."""
    from jax.experimental.pallas import tpu as pltpu

    def fence(phase: int, plus_peer, minus_peer):
        if interpret:
            return
        pltpu.semaphore_signal(ready_sems.at[phase, 1], inc=1,
                               device_id=peer_id(plus_peer),
                               device_id_type=id_type)
        pltpu.semaphore_signal(ready_sems.at[phase, 0], inc=1,
                               device_id=peer_id(minus_peer),
                               device_id_type=id_type)
        pltpu.semaphore_wait(ready_sems.at[phase, 0], 1)
        pltpu.semaphore_wait(ready_sems.at[phase, 1], 1)

    return fence
