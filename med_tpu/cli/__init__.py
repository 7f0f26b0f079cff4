"""CLI drivers replacing the reference's training notebooks (SURVEY.md §2.4):

  python -m med_tpu.cli.train_window                (train_window.ipynb)
  python -m med_tpu.cli.train_window_es             (train_window_ES.ipynb)
  python -m med_tpu.cli.train_window_es_sequential  (…_ES_sequential.ipynb)
  python -m med_tpu.cli.train_frame                 (train_frame.ipynb)
  python -m med_tpu.cli.train_frame_es              (train_frame_ES.ipynb)
  python -m med_tpu.cli.train_frame_es_sequential   (…_ES_sequential.ipynb)
  python -m med_tpu.cli.ensemble                    (ensemble.ipynb)
  python -m med_tpu.cli.preprocess                  (notebooks/data_processing.ipynb)
  python -m med_tpu.cli.resnet_finetune             (notebooks/resnet_finetuning.ipynb)
  python -m med_tpu.cli.results                     (notebooks/results.ipynb)

Data layout: ``<data_root>/<fold>/`` containing train.csv / test.csv, the
per-trial .npz (or reference .pkl) files, and stats.npz (or the reference
*.pth statistics).
"""
