#!/bin/bash
set -e
cd /root/repo
D=runs/hm50
mkdir -p $D/data
python -m hlax.cli.generate --destination $D/data --num_3 25 --num_6 25 \
  --missing 25 --datatype_config D4 --seed 7 \
  --splits prediction,test,validation
cat > $D/cfg.txt <<CFG
--data_source_path=$D/data
--save_path=$D/run
--results_path=/results
--csv_types_file=data_types_D4.csv
--csv_file_data=prediction_data_D4.csv
--csv_file_label=prediction_label.csv
--mask_file=prediction_mask.csv
--csv_file_test_data=test_data_D4.csv
--csv_file_test_label=test_label.csv
--test_mask_file=test_mask.csv
--csv_file_prediction_data=prediction_data_D4.csv
--csv_file_prediction_label=prediction_label.csv
--prediction_mask_file=prediction_mask.csv
--csv_file_validation_data=validation_data_D4.csv
--csv_file_validation_label=validation_label.csv
--validation_mask_file=validation_mask.csv
--csv_file_generation_data=test_data_D4.csv
--csv_file_generation_label=test_label.csv
--generation_mask_file=test_mask.csv
--varying_T=True
--latent_dim=32
--id_covariate=2
--M=60
--P=50
--T=20
--epochs=60
--save_interval=30
--num_dim=1296
--type_KL=GPapprox_closed
--subjects_per_batch=20
--natural_gradient=True
--natural_gradient_lr=0.01
--constrain_scales=True
--run_tests=True
--run_validation=True
--generate_images=True
--cat_kernel=[2]
--bin_kernel=[]
--sqexp_kernel=[0]
--cat_int_kernel=[{'cont_covariate':0,'cat_covariate':2},{'cont_covariate':0,'cat_covariate':3},{'cont_covariate':1,'cat_covariate':4}]
--bin_int_kernel=[]
--covariate_missing_val=[]
--hidden_layers=[500]
--conv_hivae=True
--y_dim=5
--gp_dtype=float32
--model_dtype=float32
CFG
python -m hlax.cli.main --f=$D/cfg.txt 2>&1 | grep -v WARNING
