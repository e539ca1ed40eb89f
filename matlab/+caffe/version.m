function v = version()
% caffe.version() — ask the connected bridge daemon for the framework
% version string (mms_answer_selection_tpu.__version__).  Requires a
% prior caffe.connect(host, port); errors if no connection exists.
v = caffe_('version');
end
