#!/bin/bash
# Judge r3 verification driver: multichip dryrun first, then 4 sequential pytest chunks.
cd /root/repo
mkdir -p /tmp/judge
echo "=== DRYRUN start $(date) ===" > /tmp/judge/dryrun.log
timeout 1200 python __graft_entry__.py 8 >> /tmp/judge/dryrun.log 2>&1
echo "DRYRUN_RC=$?" >> /tmp/judge/dryrun.log

C1="tests/test_auction.py tests/test_aux_tools.py tests/test_bf16.py tests/test_cli.py tests/test_collective_audit.py tests/test_collector_loop.py tests/test_data.py tests/test_ema.py tests/test_ep.py tests/test_eval_cli_bdd.py tests/test_evals.py tests/test_export.py"
C2="tests/test_fast_pool.py tests/test_feature_cache.py tests/test_feature_matrix.py tests/test_frozen_dce.py tests/test_full_automoe_parity.py tests/test_fused.py tests/test_fused_automoe.py tests/test_grad_accum.py tests/test_infer.py tests/test_lapjv.py tests/test_loop_ckpt.py tests/test_losses.py"
C3="tests/test_models.py tests/test_multihost.py tests/test_native_packed.py tests/test_pallas_auction.py tests/test_pallas_stem.py tests/test_pipeline_smoke.py tests/test_pp.py tests/test_qat.py tests/test_quant.py tests/test_remat.py tests/test_repro_and_compose.py tests/test_schedule.py"
C4="tests/test_serving_mesh.py tests/test_serving_server.py tests/test_sp.py tests/test_supervisor.py tests/test_tools.py tests/test_torch_export.py tests/test_torch_parity.py tests/test_torch_train_parity.py tests/test_torchvision_manifest.py tests/test_tp.py tests/test_train.py"

i=1
for CHUNK in "$C1" "$C2" "$C3" "$C4"; do
  echo "=== CHUNK $i start $(date) ===" > /tmp/judge/chunk$i.log
  timeout 1700 python -m pytest $CHUNK -q >> /tmp/judge/chunk$i.log 2>&1
  echo "CHUNK${i}_RC=$?" >> /tmp/judge/chunk$i.log
  i=$((i+1))
done
echo ALL_DONE > /tmp/judge/done
