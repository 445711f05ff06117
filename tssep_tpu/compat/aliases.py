"""Factory-path aliases: configs written for the torch reference
(``tssep.train.*`` dotted paths) resolve to the equivalent native classes,
so a user can point this framework at an existing reference ``config.yaml``.
"""

from tssep_tpu.config.configurable import register_alias

_ALIASES = {
    # feature extractors
    'tssep.train.feature_extractor.Log1pMaxNormAbsSTFT':
        'tssep_tpu.features.extractor.Log1pMaxNormAbsSTFT',
    'tssep.train.feature_extractor.MVNLog1pAbsSTFT':
        'tssep_tpu.features.extractor.MVNLog1pAbsSTFT',
    'tssep.train.feature_extractor.Log1pAbsIPDSTFT':
        'tssep_tpu.features.extractor.Log1pAbsIPDSTFT',
    'tssep.train.feature_extractor.Log1pMaxNormAbsIPDSTFT':
        'tssep_tpu.features.extractor.Log1pMaxNormAbsIPDSTFT',
    'tssep.train.feature_extractor.NoFeatureSTFT':
        'tssep_tpu.features.extractor.NoFeatureSTFT',
    'tssep.train.feature_extractor.ConcaternatedSTFTFeatures':
        'tssep_tpu.features.extractor.ConcatenatedSTFTFeatures',
    'tssep.train.feature_extractor.TorchMFCC':
        'tssep_tpu.features.extractor.MFCC',
    'tssep.train.feature_extractor_torchaudio.TorchMFCC':
        'tssep_tpu.features.extractor.MFCC',
    'tssep.train.feature_extractor.STFT':
        'tssep_tpu.features.extractor.STFTFeatures',
    'tssep.train.feature_extractor.AbsSTFT':
        'tssep_tpu.features.extractor.AbsSTFT',
    'tssep.train.feature_extractor.Log1pAbsSTFT':
        'tssep_tpu.features.extractor.Log1pAbsSTFT',
    'tssep.train.feature_extractor.KaldiTorchMFCC':
        'tssep_tpu.features.kaldi.KaldiMFCC',
    'tssep.train.feature_extractor.KaldiTorch':
        'tssep_tpu.features.kaldi.FuncFeature',
    # data
    'tssep.data.DummyReader': 'tssep_tpu.data.dummy.DummyReader',
    # network
    'tssep.train.net.MaskEstimator_v2': 'tssep_tpu.nn.estimator.MaskEstimator',
    'tssep.train.net.AuxNet': 'tssep_tpu.nn.estimator.AuxNet',
    'tssep.train.net.Linear': 'tssep_tpu.nn.estimator.LinearAux',
    'tssep.train.net.InstanceNorm': 'tssep_tpu.nn.norm.InstanceNorm',
    'tssep.train.net.InstanceNorm_v2': 'tssep_tpu.nn.norm.InstanceNorm_v2',
    # enhancers
    'tssep.train.enhancer.Masking': 'tssep_tpu.tasks.enhancer.Masking',
    'tssep.train.enhancer.Nothing': 'tssep_tpu.tasks.enhancer.Nothing',
    'tssep.train.enhancer.Dummy': 'tssep_tpu.tasks.enhancer.Dummy',
    'tssep.train.enhancer.TorchBF': 'tssep_tpu.tasks.enhancer.SoudenMVDR',
    'tssep.train.enhancer.ClassicBF_np': 'tssep_tpu.eval.classic_bf.ClassicBF',
    'tssep.train.enhancer.WPE': 'tssep_tpu.eval.wpe.WPE',
    'tssep.train.enhancer.ChannelWiseWPE': 'tssep_tpu.eval.wpe.ChannelWiseWPE',
    'tssep.train.enhancer_distortion_mask.OneMinus':
        'tssep_tpu.eval.classic_bf.OneMinus',
    'tssep.train.enhancer_distortion_mask.SumCrossTalker':
        'tssep_tpu.eval.classic_bf.SumCrossTalker',
    # losses
    'tssep.train.loss.MSE': 'tssep_tpu.tasks.losses.MSE',
    'tssep.train.loss.MAE': 'tssep_tpu.tasks.losses.MAE',
    'tssep.train.loss.LogMAE': 'tssep_tpu.tasks.losses.LogMAE',
    'tssep.train.loss.FreqMSE': 'tssep_tpu.tasks.losses.FreqMSE',
    'tssep.train.loss.VADSigmoidBCE': 'tssep_tpu.tasks.losses.VADSigmoidBCE',
    'tssep.train.loss.SignalAndVADSigmoidBCE':
        'tssep_tpu.tasks.losses.SignalAndVADSigmoidBCE',
    # model / experiment / runtime
    'tssep.train.model.Model': 'tssep_tpu.tasks.model.Model',
    'tssep.train.experiment.Experiment':
        'tssep_tpu.train.experiment.Experiment',
    'tssep.train.init_ckpt.InitCheckPoint':
        'tssep_tpu.train.init_ckpt.InitCheckPoint',
    'tssep.train.init_ckpt.InitCheckPointVAD2Sep':
        'tssep_tpu.train.init_ckpt.InitCheckPointVAD2Sep',
    'padertorch.train.trainer.Trainer': 'tssep_tpu.train.trainer.Trainer',
    'padertorch.train.optimizer.Adam': 'tssep_tpu.train.optimizer.Adam',
    'padertorch.train.optimizer.SGD': 'tssep_tpu.train.optimizer.SGD',
}


def register_reference_aliases():
    for alias, target in _ALIASES.items():
        register_alias(alias, target)


register_reference_aliases()
