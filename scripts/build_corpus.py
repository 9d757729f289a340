#!/usr/bin/env python
"""Synthesize the dv training corpus.

The reference outsources all model quality to remote gateways; our engine
serves in-house weights, so the framework owns the full loop: corpus ->
tokenizer -> train -> serve.  This script deterministically generates an
interview-domain corpus whose *formats match the serving prompts exactly*
(deepvision_tpu/web/runtime/interview.py build_interview_prompt, report_v3
draft prompts, assistant chat, scenario generation, solution copy), so a
model trained on it produces parseable JSON for every call type the app
sends: question/question_fast/question_deep, report_draft, report_review,
summary/doc_summary, search_decision, assessment, chat, scenario,
solution_copy.

Round-2 rev: compositional answer builder (clause banks + connectors +
quantity slots) instead of fixed sentences, 3x larger phrase banks, every
optional prompt feature the server can emit (主题说明 / 参考文档 /
联网检索结果 / 采集要求 / 本轮请优先覆盖 / 【历史摘要】), and generators
for the three call types round 1 lacked (chat, scenario, solution_copy).

Usage: python scripts/build_corpus.py --out data/corpus/dv_corpus.txt \
           [--mb 120] [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepvision_tpu.web.runtime import prompt_formats  # noqa: E402

SCENARIO_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources", "scenarios", "builtin",
)

# --------------------------------------------------------------------------
# Phrase banks (original content; domain = requirements interviews)
# --------------------------------------------------------------------------

TOPICS = [
    "电商平台会员体系升级", "制造业设备巡检数字化", "银行信贷审批流程再造",
    "连锁零售门店补货系统", "医院预约挂号平台改版", "物流园区智能调度中心",
    "企业内部知识库建设", "政务服务一网通办入口", "在线教育直播课堂优化",
    "新能源充电桩运营平台", "餐饮供应链协同系统", "保险理赔自动化审核",
    "智慧社区物业服务小程序", "跨境电商清关申报系统", "汽车经销商CRM升级",
    "券商投顾智能推荐引擎", "地产项目成本管控平台", "农产品溯源区块链应用",
    "航空公司常旅客计划改造", "运营商家庭宽带装维派单",
    "SaaS客服工单系统重构", "园区能耗监测与优化", "母婴品牌私域运营工具",
    "二手车检测定价平台", "酒店收益管理系统选型", "城市停车位共享平台",
    "印刷厂生产排程优化", "律所案件管理协同平台", "基金公司直销APP改版",
    "宠物医院连锁信息化",
    # round-2 additions
    "生鲜冷链全程温控追踪", "建筑工地安全巡查平台", "高校教务排课系统重建",
    "三甲医院检验报告互认平台", "省级电网负荷预测系统", "快递末端驿站管理工具",
    "商业银行对公开户流程优化", "证券合规留痕审计系统", "港口集装箱堆场调度",
    "钢铁厂能源管理中台", "乳制品经销商订货平台", "连锁健身房会籍管理",
    "出版社选题评审数字化", "广告代理商投放中台", "旅行社定制游报价系统",
    "家装公司工地交付管理", "检测机构实验室信息系统", "市政热力管网监测",
    "煤矿井下人员定位系统", "风电场运维工单平台", "眼镜连锁验光档案系统",
    "跨境支付对账自动化", "猎头公司候选人管理", "会展中心场地预订系统",
    "大型商场租户结算平台", "汽车金融贷后风控系统", "药店连锁处方流转平台",
    "环卫车辆智能调度", "职业培训机构督学系统", "水务集团管网漏损分析",
    "机场地勤资源排班", "期货公司风控预警平台", "图书馆智能荐书引擎",
    "体检中心报告解读助手", "服装品牌智能补货", "融资租赁资产管理系统",
    "公交集团线网优化分析", "消防设施联网监测平台", "高端民宿收益托管系统",
    "半导体封测排产系统", "地铁车辆段检修管理", "电子合同签署中台",
    "农商行整村授信平台", "儿童乐园会员储值系统", "危化品运输电子运单",
    "美妆品牌BA赋能工具", "县域医共体转诊平台", "光伏电站发电量预测",
    "白酒企业渠道防窜货", "跨境SaaS多币种计费", "智慧食堂营养配餐系统",
    "殡葬服务预约管理平台", "宠物食品订阅电商", "冷库仓储租赁计费系统",
    "职工疗养院床位管理", "电竞场馆赛事运营平台", "再生资源回收调度",
    "口腔诊所连锁运营中台", "茶叶品牌溯源与会员", "高速公路服务区经营分析",
]

TOPIC_DESCS = [
    "该项目由{role}牵头，覆盖总部与区域分支机构，预计分两期交付。",
    "业务方希望先解决{pain_short}，再考虑长期平台化。",
    "公司处于快速扩张期，现有系统已无法支撑业务量的增长。",
    "这是年度重点项目，管理层要求季度内看到可量化的改善。",
    "项目背景是监管要求趋严，现有做法存在合规风险。",
    "多个部门各自建设了工具，这次希望统一整合并打通数据。",
    "去年做过一次失败的尝试，这次希望先小范围验证再推广。",
    "一线员工对新系统接受度是关键，易用性被列为首要目标。",
]

PAIN_POINTS = [
    "人工处理效率低，高峰期单据积压严重",
    "多套系统数据不互通，口径经常对不上",
    "现有流程依赖线下审批，周期长且不透明",
    "客户流失率上升但缺乏归因手段",
    "库存周转慢，呆滞库存占用大量资金",
    "一线员工操作复杂，培训成本高",
    "报表出数滞后，管理层决策缺少实时依据",
    "供应商协同靠邮件和电话，错漏频发",
    "老系统技术栈陈旧，扩展一个功能要改多处",
    "促销活动规则复杂，配置出错会直接造成资损",
    "跨部门需求排期冲突，优先级缺少统一标准",
    "数据安全与合规要求提高，现有权限体系粒度不够",
    # round-2 additions
    "工单流转靠微信群接龙，责任人经常不明确",
    "同一客户在不同系统里有多条重复档案",
    "高峰时段系统响应超过十秒，投诉集中爆发",
    "纸质单据归档占用两名全职人力",
    "夜间批处理经常跑超时，影响次日开业",
    "临时用工排班靠经验，忙闲不均问题突出",
    "价格调整要逐门店手工同步，时常漏改",
    "历史数据散落在个人电脑里，人员流动就丢失",
    "异常告警太多，真正重要的反而被淹没",
    "对账差异靠月底人工盘点，问题发现太晚",
    "客户投诉处理没有时限约束，容易不了了之",
    "现场拍照取证不规范，事后追责缺少依据",
    "设备档案不全，维修师傅到场才发现缺配件",
    "新人接手老项目没有文档，只能口口相传",
    "渠道返利规则年年变，核算口径争议不断",
    "审批人出差就卡流程，没有代理机制",
    "测试环境与生产差异大，上线后问题频出",
    "各区域自定报表格式，总部汇总要重新加工",
    "会员权益兑现流程长，到账慢引发客诉",
    "外包团队交付质量不稳定，验收标准不统一",
    "峰值流量是平时的十倍，扩容只能提前压测猜测",
    "线下活动报名与签到数据对不上",
    "合同版本管理混乱，盖章版与执行版不一致",
    "司机打卡位置造假，在途监控形同虚设",
    "退换货入库检验标准因人而异",
    "知识沉淀靠个人笔记，搜索命中率很低",
    "排产计划一天变三次，车间无所适从",
    "跨境结算汇率敞口没有系统化管理",
    "隐私数据导出缺少审批与水印，存在泄露隐患",
]

GOALS = [
    "把平均处理时长从两天压缩到两小时以内",
    "建立统一的数据口径和实时看板",
    "实现审批流程全程线上化、可追溯",
    "将复购率提升百分之十五以上",
    "库存周转天数下降三成",
    "新员工一周内可独立上岗",
    "核心报表T+0产出",
    "供应商准时交付率达到98%",
    "新功能平均交付周期缩短到两周",
    "活动配置零资损事故",
    "建立统一的需求优先级评审机制",
    "通过等保三级与行业合规审计",
    # round-2 additions
    "客诉平均响应时间压到三十分钟以内",
    "单据电子化率达到95%以上",
    "夜间批处理窗口缩短到两小时",
    "重复客户档案合并率达到99%",
    "告警准确率提升到八成以上",
    "对账差异当日发现、三日内闭环",
    "一线操作步骤从十二步精简到五步",
    "渠道返利核算从月结变为周结",
    "排班公平性投诉下降一半",
    "知识库搜索首屏命中率超过七成",
    "峰值扩容从小时级缩短到分钟级",
    "合同起草到用印全流程不超过三天",
    "在途异常十五分钟内触达责任人",
    "新门店开业系统准备时间缩短到一天",
    "数据导出全部留痕并自动脱敏",
    "设备故障平均修复时长下降四成",
    "培训课程完课率达到九成",
    "跨系统数据同步延迟控制在一分钟内",
    "预测准确率提升到85%以上",
    "人工复核比例降到一成以下",
    "会员权益实时到账",
    "现场巡检覆盖率做到百分之百",
    "项目毛利核算精确到单个工地",
    "多币种对账自动化率超过九成",
]

CONSTRAINTS = [
    "预算上限约两百万元，分两期投入",
    "必须兼容现有ERP与财务系统接口",
    "上线窗口在下一个业务淡季，约四个月后",
    "团队只有两名后端与一名前端可投入",
    "数据不允许出私有化机房",
    "需保留旧系统并行运行至少一个季度",
    "供应商需具备同行业交付案例",
    "移动端必须覆盖微信小程序",
    "高峰并发约每秒三千次查询",
    "历史数据迁移量约二十亿条",
    # round-2 additions
    "所有隐私字段必须加密存储并支持审计",
    "一线门店网络条件差，必须支持弱网和离线",
    "集团安全部门要求统一单点登录",
    "年底封网期间不允许任何生产变更",
    "必须复用集团已采购的中间件与数据库授权",
    "涉及工会与排班制度，方案需通过职代会评审",
    "接口改造需第三方配合，其排期不可控",
    "监管报送格式每季度可能调整，需快速适配",
    "硬件已招标完成，方案不得更换服务器型号",
    "多语言支持至少覆盖中英双语",
    "系统需通过集团灾备演练，RTO小于一小时",
    "老设备只支持串口协议，必须做协议转换",
]

ROLES = [
    "产品负责人", "技术总监", "运营经理", "业务部门主管", "创始人",
    "项目经理", "数据分析师", "客服主管", "供应链总监", "财务负责人",
    "渠道经理", "区域销售总监", "IT基础架构负责人", "合规风控专员",
    # round-2 additions
    "门店店长", "仓储主管", "质量负责人", "人力资源总监", "采购经理",
    "信息科主任", "生产计划员", "售后服务总监", "安全总监", "培训负责人",
]

QUANTS = [
    "约三成", "近一半", "超过六成", "大约两倍", "每天上百次", "每月数十起",
    "约两小时", "平均三天", "接近百万元", "每年数百万元", "约二十人",
    "十几个环节", "四个区域", "七个部门", "上千家门店", "数万名会员",
]

OPTION_BANK = [
    ["效率优先", "质量优先", "成本优先", "体验优先", "其他（请说明）"],
    ["已有明确方案", "有初步想法", "还在调研", "完全未开始"],
    ["核心业务流程", "辅助支撑环节", "对外服务能力", "内部管理需求"],
    ["一个月内", "一个季度内", "半年以上", "时间不确定"],
    ["自研为主", "采购成熟产品", "混合方案", "尚未决定"],
    ["每天多次", "每周几次", "每月几次", "偶尔使用"],
    ["强烈需要", "比较需要", "可有可无", "不需要"],
    ["百万元以内", "一百到五百万", "五百万以上", "预算未定"],
    # round-2 additions
    ["总部集中管控", "区域自治", "混合模式", "尚无定论"],
    ["全量替换", "增量改造", "并行双轨", "暂缓实施"],
    ["影响营收", "影响成本", "影响合规", "影响口碑"],
    ["高层推动", "业务部门发起", "IT主导", "外部咨询建议"],
    ["已有专职团队", "兼职维护", "完全外包", "无人负责"],
    ["纸质记录", "Excel维护", "老系统录入", "没有记录"],
    ["实时同步", "小时级同步", "天级同步", "手工导入"],
    ["非常满意", "基本可用", "勉强凑合", "急需更换"],
    ["公有云", "私有化部署", "混合云", "未确定"],
    ["一线员工", "中层管理者", "高管", "外部客户"],
    ["立即全面推广", "试点后推广", "仅在总部使用", "再观望一段时间"],
    ["数据打通", "流程再造", "组织调整", "工具升级"],
    ["已完成立项", "正在立项", "预算审批中", "尚未启动"],
    ["可接受停机", "仅夜间停机", "必须不停机", "视情况而定"],
]

STEMS = [
    "在{aspect}方面，您目前遇到的最大挑战是什么？",
    "关于{aspect}，您期望达到的理想状态是怎样的？",
    "请描述{aspect}涉及的具体场景、频率和参与角色。",
    "针对{aspect}，您已经尝试过哪些做法？效果如何？",
    "如果资源有限，{aspect}中哪一项您认为必须优先解决？",
    "{aspect}目前由谁负责？判断好坏的标准是什么？",
    "能否量化一下{aspect}带来的影响，比如时间、成本或人力？",
    "{aspect}的现状与一年前相比有什么变化？",
    "在{aspect}上，团队内部是否存在分歧？主要集中在哪里？",
    "如果{aspect}得到解决，您预期最先看到哪些改善？",
    "{aspect}相关的数据目前存放在哪些系统里？口径一致吗？",
    "围绕{aspect}，最近一次出问题的具体经过是怎样的？",
    "{aspect}的决策流程是怎样的？需要哪些角色审批？",
    "您认为{aspect}的瓶颈更多在流程、工具还是人员能力？",
    "针对{aspect}，同行或竞品的做法您了解多少？",
    "{aspect}如果继续维持现状，半年后会发生什么？",
    # round-2 additions
    "{aspect}在一天之内的峰谷分布是怎样的？高峰出现在什么时候？",
    "{aspect}涉及哪些上下游系统或外部合作方？",
    "针对{aspect}，目前有没有应急预案？最近一次启用是什么时候？",
    "在{aspect}上，您最不能妥协的底线是什么？",
    "{aspect}的预算或人力投入近两年是增加还是减少？为什么？",
    "如果用一个指标衡量{aspect}的成败，您会选哪个？现在数值是多少？",
    "{aspect}的相关制度或SOP是否成文？实际执行率如何？",
    "推动{aspect}改进时，您预计最大的阻力来自哪里？",
    "{aspect}出现异常时，现在需要多久才能被发现并定位？",
    "关于{aspect}，一线员工和管理层的看法一致吗？差异在哪？",
    "{aspect}的历史数据保留了多久？质量能支撑分析吗？",
    "针对{aspect}，您希望系统自动化到什么程度？哪些环节必须保留人工？",
    "{aspect}与考核或激励挂钩吗？挂钩方式是什么？",
    "假设{aspect}的改造明天就上线，您最担心发生什么？",
    "在{aspect}上，过去是否有过投入打水漂的教训？原因是什么？",
    "{aspect}的服务对象是谁？他们最常抱怨的是什么？",
    "{aspect}目前依赖哪些关键岗位的个人经验？有备份吗？",
    "针对{aspect}，合规或审计方面有没有硬性要求？",
    "{aspect}的改进收益您打算如何向管理层证明？",
    "如果分三步走，{aspect}的第一步您会做什么？",
    # round-5 additions — more stem entropy (EVAL_r04 measured 92-94%
    # distinct questions at T=0.7: one in 12-16 draws collided; the
    # reference dedupes near-identical questions at serving,
    # web/server.py:20059, and the model side of the fix is a corpus
    # whose question distribution has more mass to spread)
    "{aspect}从发起到闭环一般要经过几个环节？最慢的是哪一环？",
    "有没有因为{aspect}错过业务机会的例子？损失怎么算的？",
    "{aspect}上个季度被讨论得最多的问题是什么？结论落地了吗？",
    "如果把{aspect}外包出去，您最不放心的是什么？",
    "{aspect}的例外情况多吗？现在是怎么特批的？",
    "新员工接手{aspect}一般要多久才能独立上手？卡在哪里？",
    "{aspect}相关的报表现在谁在看？看完会触发什么动作？",
    "过去半年{aspect}的投诉或工单量大概是什么量级？",
    "{aspect}有没有季节性或周期性规律？怎么应对峰值？",
    "围绕{aspect}，您更看重上线速度还是功能完整度？为什么？",
    "{aspect}现在最依赖哪个供应商或外部平台？切换成本高吗？",
    "如果{aspect}必须砍掉一半预算，您会先保住哪部分？",
    "{aspect}的操作目前在什么终端完成？现场环境有什么限制？",
    "{aspect}和哪些部门的KPI直接相关？口径有争议吗？",
    "您理想中{aspect}的日常操作应该几步完成？现在是几步？",
    "{aspect}出错时的补救流程是什么？平均要花多久？",
    "有没有为{aspect}定过专项目标？达成情况如何？",
    "{aspect}的权限现在怎么管？有没有越权或滥用的隐患？",
    "如果请您给{aspect}的现状打分（1-10），您打几分？差在哪里？",
    "{aspect}的上线窗口有硬性截止吗？错过会怎样？",
    "围绕{aspect}，历史上推过几次改造？为什么没成？",
    "{aspect}的关键数据谁有权修改？修改留痕吗？",
    "您希望{aspect}多久出一次可核查的进展？以什么形式？",
    "{aspect}在多地/多法人之间有差异吗？需要统一还是保留？",
    "针对{aspect}，培训和推广您打算怎么做？谁来负责？",
    "{aspect}如果做成了，对您个人或团队意味着什么？",
    "{aspect}相关的线下动作有哪些？哪些必须保留线下？",
    "要验证{aspect}的改进效果，您会先在哪个场景试点？",
    "{aspect}的需求里哪些是'必须有'，哪些只是'最好有'？",
    "竞争对手在{aspect}上的动作，对您的节奏有影响吗？",
    "{aspect}涉及个人信息或敏感数据吗？脱敏要求是什么？",
    "如果系统半天不可用，{aspect}会受多大影响？有降级方案吗？",
    # topic-referencing stems: the topic sits in the prompt head, so the
    # model learns to weave it in — across-topic draws can then never
    # collide on exact text (half the eval's collision surface)
    "结合{topic}的整体目标，{aspect}应该优先到什么程度？",
    "在{topic}范围内，{aspect}和其他模块的边界怎么划？",
    "{topic}立项时对{aspect}的预期是什么？现在变了吗？",
    "就{topic}而言，{aspect}的历史包袱主要是什么？",
    "如果{topic}只做一期，{aspect}要进一期范围吗？为什么？",
    "{topic}的干系人里，谁对{aspect}的意见分量最重？",
    "从{topic}的验收角度看，{aspect}怎样才算合格？",
    "{topic}上线后，{aspect}的运营由谁接手？准备好了吗？",
    "在{topic}的预算盘子里，{aspect}大概占多大比例？",
    "{topic}推进过程中，{aspect}最可能在哪个阶段出风险？",
    "围绕{topic}，{aspect}需要和哪些存量系统对接？",
    "如果{topic}延期，{aspect}有没有可以先行的独立价值？",
]

# Compositional answer clauses — joined 1-3 per answer with connectors.
ANSWER_OPENERS = [
    "我们目前主要依靠人工在表格里维护，{pain}",
    "这个问题业务部门反馈很多次了，核心是{pain}",
    "理想状态是{goal}，但现在差距还比较大",
    "我们倾向于{opt}，因为团队经验和预算都更匹配",
    "上一次尝试过外采方案，效果一般，主要卡在{pain}",
    "管理层最关心的是{goal}，其次才是成本",
    "约束方面，{constraint}，这点在方案里必须考虑",
    "如果必须排序，我会把{opt}放在第一位",
    "涉及的角色包括{role}和一线执行同事，流程跨三个部门",
    "我们做过一轮调研，同行普遍的做法也验证了{goal}的价值",
    # round-2 additions
    "坦白说现状比较被动，{pain}",
    "从数据看影响面{quant}，不能再拖了",
    "这件事由{role}直接牵头，汇报线很短",
    "我们内部有分歧：业务想要{opt}，技术担心{constraint}",
    "现在的做法是{opt}，已经运转了三年多",
    "最近一次事故就是因为{pain}，复盘会上定了整改时限",
]

ANSWER_FOLLOWUPS = [
    "具体来说，{pain}，每月因此损失{quant}的产能",
    "补充一点，{constraint}，所以节奏不能太激进",
    "我们的验收标准很明确：{goal}",
    "如果要量化，大概影响{quant}的订单",
    "一线同事的反馈集中在操作繁琐和响应慢两点",
    "这块的数据目前分散在三个系统里，口径还没统一",
    "高峰期尤其明显，大约是平时的{quant}",
    "之前请咨询公司做过诊断，结论也指向{pain}",
    "预算上需要分期，首期先覆盖最痛的环节",
    "{role}的意见是先试点一个区域，跑通再推广",
]

CONNECTORS = ["。", "。另外，", "。需要说明的是，", "。从我的角度看，", "。"]

DOC_NAMES = [
    "业务流程现状说明.docx", "季度运营数据汇总.xlsx", "竞品调研纪要.pdf",
    "系统架构评估报告.pdf", "年度规划摘要.pptx", "客户投诉分析.xlsx",
    "上期项目复盘.docx", "接口清单.xlsx", "合规自查报告.pdf",
]

DOC_SUMMARIES = [
    "文档梳理了现有{quant}个审批环节，指出{pain_short}是主要堵点。",
    "数据显示近半年{pain_short}，环比恶化{quant}。",
    "报告建议优先实现{goal_short}，并给出了分阶段路线图。",
    "纪要记录了与{role}的三轮沟通结论：范围先收敛到核心流程。",
    "评估认为现有架构可支撑一年，但{pain_short}需要尽快处理。",
]

SEARCH_SNIPPETS = [
    "行业报告显示，头部企业已普遍将{goal_short}纳入年度考核指标。",
    "公开资料表明，同类项目平均实施周期为四到六个月。",
    "近期监管动态：相关领域新规将于明年生效，要求留痕与可追溯。",
    "多家供应商发布了面向该场景的标准化产品，成熟度参差不齐。",
    "技术社区的主流实践是先建数据底座，再做流程自动化。",
]

CHAT_QUESTIONS = [
    "这个问题是什么意思？我不太理解。",
    "这几个选项有什么区别？帮我分析一下。",
    "我应该选哪个比较好？",
    "可以举个例子吗？",
    "这个问题和我们的业务有什么关系？",
    "访谈还要多久？后面还有什么环节？",
    "如果我不确定，可以先跳过吗？",
    "多选的话选几个合适？",
]

CHAT_REPLIES = [
    "这个问题想了解的是{aspect}的真实现状。建议先说明目前的做法，再补充最近一次出问题的例子，信息量会更足。",
    "几个选项分别代表不同的推进路径：{opt1}意味着节奏快但风险高；{opt2}更稳妥但周期长。结合您刚才提到的{pain_short}，建议选择「{opt1}」。",
    "结合前面的回答，您团队的约束是{constraint}，所以更匹配的是「{opt1}」。如果拿不准，可以在理由里说明前提条件。",
    "举个例子：假设{pain_short}，那么本题应选能直接缓解该问题的选项，并在补充说明里给出量化影响。",
    "这道题与报告的「{aspect}」章节直接相关，回答越具体，后续生成的方案就越贴合实际。建议包含场景、频率和影响三要素。",
]

SOLUTION_VALUE = [
    "以{goal_short}为北极星指标，先打通数据再重塑流程，确保每一期投入都有可量化的业务回报。",
    "方案围绕{pain_short}逐层拆解，用最小可行版本验证价值，再按节奏扩展到全量场景。",
    "聚焦一线效率与管理可视两条主线，{quant}的改善空间已在访谈中得到数据佐证。",
]

SOLUTION_APPROACH = [
    "第一阶段搭建统一数据底座并完成核心流程线上化；第二阶段引入自动化与智能推荐；全程保留旧系统并行回退通道。",
    "采用试点-推广两步走：先在一个区域跑通端到端闭环，沉淀SOP后按月滚动复制。",
    "以接口适配层隔离老系统，新能力全部服务化，确保{constraint_short}的前提下平滑演进。",
]

SOLUTION_COMMITMENT = [
    "承诺上线后三十天内完成全员培训，关键指标周报同步，未达标项在下一迭代优先修复。",
    "提供一年期驻场运维与季度健康巡检，重大故障三十分钟响应。",
    "以验收指标为准绳分期付款，每期交付物均可独立审计。",
]

PROSE_TEMPLATES = [
    "{topic}项目的背景是：{pain}。业务方期望{goal}，同时受到以下约束：{constraint}。"
    "访谈中{role}强调，方案必须先解决最影响一线效率的环节，再逐步扩展。",
    "在{topic}的调研中，我们发现{pain}。这一问题的根因在于流程与系统的割裂，"
    "因此建议优先建设统一的数据底座，再推进流程线上化，最终实现{goal}。",
    "需求访谈是一种结构化的信息采集方法：围绕既定维度逐层提问，"
    "通过追问澄清模糊表述，并用证据等级标注每条结论的可信度。"
    "对于{topic}这类项目，关键维度包括目标价值、业务流程、技术约束与实施计划。",
    "{role}在访谈中提到，{pain}，并补充说明了量化影响。"
    "结合参考资料与检索结果，我们将其归类为高优先级诉求，"
    "对应的成功标准是{goal}。",
    "方案评审会上，围绕{topic}形成了两种路线：一是快速落地的轻量改造，"
    "二是彻底重构。考虑到{constraint}，最终倾向于分阶段推进，"
    "第一阶段以{goal}为验收目标。",
    # round-2 additions
    "复盘{topic}的推进过程可以看到：立项阶段对{pain}的量化不足，"
    "导致一期范围过大。调整后聚焦单一场景，两个月即达成{goal}，"
    "验证了小步快跑的价值。",
    "评估一个需求是否值得投入，可以从影响面、频率、替代成本三个维度打分。"
    "以{topic}为例，{pain}影响{quant}的业务量，属于高优先级。",
    "落地{topic}时常见的误区是把工具升级当成目标。实际上{goal}才是"
    "业务真正关心的结果，工具只是路径之一，组织与流程的配套同样关键。",
    "访谈纪要的质量决定报告的上限：每条结论都应标注来源问题编号，"
    "弱证据结论要安排追问确认。{role}的经验是，宁可少写一条，"
    "也不要写没有依据的判断。",
]

EN_PROSE = [
    "A requirements interview proceeds dimension by dimension: goals, "
    "business flow, constraints, and rollout plan. Each answer is scored "
    "for evidence strength, and weak answers trigger follow-up probes.",
    "The report pipeline drafts a structured JSON document, validates it "
    "against the evidence index, repairs reference errors, and renders "
    "markdown with mermaid diagrams for flows and priority quadrants.",
    "Paged attention keeps the key-value cache in fixed-size pages so the "
    "scheduler can admit and evict sequences without copying memory.",
    "Continuous batching interleaves prefill chunks with decode steps, "
    "keeping time-to-first-token low while sustaining throughput.",
    "Evidence intents rank how much proof a question expects: low accepts "
    "a quick pick, medium wants a reason, high demands quantified facts.",
    "A good follow-up question narrows one ambiguity at a time instead of "
    "re-asking the whole topic.",
]


def _short(s: str, n: int = 14) -> str:
    return s[:n]


def load_scenarios():
    out = []
    for fn in sorted(os.listdir(SCENARIO_DIR)):
        if fn.endswith(".json"):
            with open(os.path.join(SCENARIO_DIR, fn), encoding="utf-8") as fh:
                out.append(json.load(fh))
    return out


def _fill(rng, template: str) -> str:
    """Fill any known slots appearing in the template."""
    return template.format(
        pain=rng.choice(PAIN_POINTS), goal=rng.choice(GOALS),
        opt=rng.choice(rng.choice(OPTION_BANK)),
        constraint=rng.choice(CONSTRAINTS), role=rng.choice(ROLES),
        quant=rng.choice(QUANTS), topic=rng.choice(TOPICS),
        pain_short=_short(rng.choice(PAIN_POINTS)),
        goal_short=_short(rng.choice(GOALS)),
        constraint_short=_short(rng.choice(CONSTRAINTS)),
    )


# --------------------------------------------------------------------------
# Example generators — formats mirror the serving prompts
# --------------------------------------------------------------------------

def _question_json(rng, dim, is_follow_up=False, topic=""):
    aspects = dim.get("key_aspects") or [dim.get("name", "核心需求")]
    aspect = rng.choice(aspects)
    q = ("追问：" if is_follow_up else "") + rng.choice(STEMS).format(
        aspect=aspect, topic=topic or rng.choice(TOPICS))
    options = rng.choice(OPTION_BANK)
    return {
        "question": q,
        "options": list(options[: rng.randint(3, len(options))]),
        "multi_select": rng.random() < 0.25,
        "is_follow_up": is_follow_up,
        "answer_mode": rng.choice(["pick_only", "pick_with_reason"]),
        "requires_rationale": rng.random() < 0.5,
        "evidence_intent": rng.choice(["low", "medium", "high"]),
        "ai_recommendation": (rng.choice(options)
                              if rng.random() < 0.3 else None),
    }


def _answer_text(rng):
    """Compose 1-3 clauses so answers don't collapse to fixed templates."""
    parts = [_fill(rng, rng.choice(ANSWER_OPENERS))]
    for _ in range(rng.randint(0, 2)):
        parts.append(_fill(rng, rng.choice(ANSWER_FOLLOWUPS)))
    out = ""
    for i, p in enumerate(parts):
        if i:
            out += rng.choice(CONNECTORS)
        out += p
    return out + "。"


def gen_question_example(rng, scenarios):
    """Question examples render through the RUNTIME builder itself
    (web/runtime/interview.py build_interview_prompt) — a synthetic
    session/dimension is sampled here and the prompt string is whatever
    the server would emit, so section ORDER can never drift between
    training and serving (round-4: the stable-first reorder shipped by
    changing the builder once).  Every optional section the server can
    emit is sampled with its observed rates."""
    from deepvision_tpu.web.runtime.interview import build_interview_prompt

    sc = rng.choice(scenarios)
    dim = rng.choice(sc["dimensions"])
    topic = rng.choice(TOPICS)
    is_follow_up = rng.random() < 0.3
    session = {
        "topic": topic,
        "description": (_fill(rng, rng.choice(TOPIC_DESCS))
                        if rng.random() < 0.35 else ""),
        "summary": "",
        "interview_log": [],
        "reference_materials": [],
    }
    n_hist = rng.randint(0, 4)
    if n_hist and rng.random() < 0.25:
        session["summary"] = (
            f"要点：{_short(rng.choice(PAIN_POINTS), 20)}；"
            f"目标是{_short(rng.choice(GOALS), 20)}。")
    for _ in range(n_hist):
        session["interview_log"].append({
            "question": _question_json(rng, dim, topic=topic)["question"],
            "answer": _answer_text(rng),
        })
    if rng.random() < 0.25:
        session["reference_materials"] = [
            {"name": rng.choice(DOC_NAMES),
             "summary": _fill(rng, rng.choice(DOC_SUMMARIES))}
            for _ in range(rng.randint(1, 2))
        ]
    search_context = (_fill(rng, rng.choice(SEARCH_SNIPPETS))
                      if rng.random() < 0.15 else "")
    focus_aspect = ""
    if rng.random() < 0.2:
        focus_aspect = rng.choice(dim.get("key_aspects") or ["核心需求"])
    target = _question_json(rng, dim, is_follow_up, topic=topic)
    contract = None
    if rng.random() < 0.4:
        contract = {"answer_mode": target["answer_mode"],
                    "evidence_intent": target["evidence_intent"]}
    prompt = build_interview_prompt(
        session, dim,
        is_follow_up=is_follow_up,
        follow_up_context=_answer_text(rng) if is_follow_up else "",
        search_context=search_context,
        capture_contract=contract,
        focus_aspect=focus_aspect,
    )
    return prompt + "\n" + json.dumps(target, ensure_ascii=False)


def _mermaid(rng, topic):
    kind = rng.randint(0, 3)
    if kind == 0:
        return ("priority_quadrant_mermaid",
                "quadrantChart\n    title 需求优先级\n    x-axis 实施难度\n"
                "    y-axis 业务价值\n"
                f"    核心诉求: [{rng.uniform(0.2, 0.5):.1f}, "
                f"{rng.uniform(0.6, 0.9):.1f}]\n"
                f"    支撑诉求: [{rng.uniform(0.4, 0.8):.1f}, "
                f"{rng.uniform(0.3, 0.6):.1f}]")
    if kind == 1:
        steps = rng.sample(["需求提出", "评审", "排期", "开发", "验收",
                            "上线", "复盘"], rng.randint(4, 5))
        chain = " --> ".join(
            f"{chr(65 + i)}[{s}]" for i, s in enumerate(steps))
        return ("business_flow_mermaid", "flowchart LR\n    " + chain)
    if kind == 2:
        return ("demand_pie_mermaid",
                "pie title 诉求分布\n"
                f"    \"流程类\" : {rng.randint(25, 45)}\n"
                f"    \"数据类\" : {rng.randint(20, 40)}\n"
                f"    \"体验类\" : {rng.randint(10, 30)}")
    return ("architecture_mermaid",
            "flowchart TB\n    U[用户端] --> G[接入网关]\n"
            "    G --> S[业务服务]\n    S --> D[(统一数据底座)]\n"
            "    S --> M[消息队列]")


def gen_report_example(rng, scenarios):
    """Report-draft examples rendered through the SAME canonical builder
    the serving pipeline uses (prompt_formats.report_draft_prompt — used
    by report_v3._draft_prompt), so served prompts are always
    in-distribution. Optional 主题说明 / 参考文档 sections appear with the
    sampling rates the server actually exhibits."""
    topic = rng.choice(TOPICS)
    n_q = rng.randint(3, 9)
    q_ids = [f"Q{i + 1}" for i in range(n_q)]
    facts = []
    for qid in q_ids:
        dim = rng.choice(rng.choice(scenarios)["dimensions"])
        answer = _answer_text(rng)
        if rng.random() < 0.2:   # serving merges rationale_text into 答
            answer += " " + _fill(rng, rng.choice(ANSWER_FOLLOWUPS))
        facts.append((qid, _question_json(rng, dim, topic=topic)["question"],
                      answer))
    description = (_fill(rng, rng.choice(TOPIC_DESCS))
                   if rng.random() < 0.3 else "")
    documents = None
    if rng.random() < 0.25:
        documents = [
            (rng.choice(DOC_NAMES), _fill(rng, rng.choice(DOC_SUMMARIES)))
            for _ in range(rng.randint(1, 2))
        ]
    prompt = prompt_formats.report_draft_prompt(
        topic, facts, description=description, documents=documents)
    draft = _report_draft(rng, topic, q_ids, n_q)
    return prompt + "\n" + json.dumps(draft, ensure_ascii=False)


def _report_draft(rng, topic, q_ids, n_q):
    """Target draft JSON whose structure matches DRAFT_REQUIRED_KEYS and
    the nested analysis/visualizations shape report_v3 validates."""
    def refs():
        return sorted(rng.sample(q_ids, rng.randint(1, min(2, n_q))))

    def long_desc(*templates):
        """3-4 filled sentences — report prose must be substantive, not
        one-liners (served drafts inherit the corpus's section depth;
        the round-3 draft target is p50 >= 800 BPE tokens end to end)."""
        parts = [_fill(rng, rng.choice(t)) for t in templates]
        parts.append(_fill(rng, rng.choice(rng.choice(templates))))
        return "".join(p if p.endswith("。") else p + "。" for p in parts)

    needs = []
    for i in range(rng.randint(4, 7)):
        needs.append({
            "title": rng.choice(["核心业务诉求", "实施路径诉求", "数据治理诉求",
                                 "一线效率诉求", "合规与安全诉求",
                                 "管理可视诉求", "协同效率诉求"]),
            "description": long_desc(
                GOALS if rng.random() < 0.6 else CONSTRAINTS,
                ANSWER_FOLLOWUPS),
            "priority": rng.choice(["P0", "P0", "P1", "P2"]),
            "refs": refs(),
        })
    viz = {}
    for _ in range(rng.randint(2, 4)):
        k, v = _mermaid(rng, topic)
        viz[k] = v
    solutions = []
    for i in range(rng.randint(3, 5)):
        solutions.append({
            "title": rng.choice(["分阶段实施方案", "数据底座先行方案",
                                 "试点推广方案", "轻量改造方案",
                                 "流程再造方案", "平台化整合方案"]),
            "description": long_desc(SOLUTION_APPROACH, SOLUTION_VALUE,
                                     SOLUTION_COMMITMENT),
            "refs": refs(),
        })
    risks = []
    for i in range(rng.randint(3, 5)):
        risks.append({
            "title": rng.choice(["数据迁移风险", "排期依赖风险", "组织配合风险",
                                 "供应商交付风险", "合规变化风险",
                                 "预算超支风险", "关键人员流失风险"]),
            "description": long_desc(CONSTRAINTS, PAIN_POINTS),
            "refs": refs(),
        })
    actions = []
    for i in range(rng.randint(3, 5)):
        actions.append({
            "title": rng.choice(["两周内完成方案评审", "本月完成数据盘点",
                                 "下周输出试点范围", "启动供应商考察",
                                 "制定数据迁移演练计划", "明确一期验收指标"]),
            "description": long_desc(ANSWER_FOLLOWUPS, GOALS),
            "refs": refs(),
        })
    draft = {
        "overview": (
            f"本报告基于对「{topic}」的{n_q}轮结构化访谈整理。"
            f"核心发现：{rng.choice(PAIN_POINTS)}；业务目标为{rng.choice(GOALS)}。"
            f"主要约束是{rng.choice(CONSTRAINTS)}。"
            + _fill(rng, rng.choice(PROSE_TEMPLATES))[:120]
        ),
        "needs": needs,
        "analysis": {
            "customer_needs": long_desc(PAIN_POINTS, GOALS,
                                        ANSWER_FOLLOWUPS),
            "business_flow": rng.choice([
                "现有流程存在线下断点，需要线上化与自动化改造。",
                "流程跨多个部门流转，交接环节缺少时限与留痕。",
                "主流程基本线上化，但异常处理仍依赖人工协调。",
            ]) + long_desc(ANSWER_FOLLOWUPS),
            "tech_constraints": long_desc(CONSTRAINTS, ANSWER_FOLLOWUPS),
            "project_constraints": long_desc(CONSTRAINTS, GOALS),
        },
        "visualizations": viz,
        "solutions": solutions,
        "risks": risks,
        "actions": actions,
        "open_questions": [rng.choice(PAIN_POINTS)
                           for _ in range(rng.randint(2, 4))],
        "evidence_index": q_ids,
    }
    return draft


def _review_issues(rng, max_n=2):
    issues = []
    for _ in range(rng.randint(1, max_n)):
        issues.append({
            "type": rng.choice(["missing_ref", "weak_evidence",
                                "inconsistent", "too_short"]),
            "severity": rng.choice(["low", "medium", "high"]),
            "message": rng.choice([
                "部分结论缺少访谈证据编号支撑，建议补充 refs。",
                "风险章节与约束描述存在矛盾，请核对后统一。",
                "行动项缺少负责人与时限，建议补全要素。",
                "需求优先级与访谈中表达的紧迫程度不一致。",
                "总览篇幅不足，未覆盖核心发现与约束。",
            ]),
            "target": rng.choice(["overview", "needs", "solutions",
                                  "risks", "actions"]),
        })
    return issues


def gen_review_example(rng, scenarios):
    """Review examples through prompt_formats.report_review_prompt — the
    exact serving prompt of report_v3._review_prompt, with the full
    response contract (pass / quality_score / issues / patch)."""
    topic = rng.choice(TOPICS)
    n_q = rng.randint(2, 4)
    q_ids = [f"Q{i + 1}" for i in range(n_q)]
    draft = _report_draft(rng, topic, q_ids, n_q)
    has_issues = rng.random() < 0.55
    issues = _review_issues(rng) if has_issues else []
    known = issues[:1] if issues and rng.random() < 0.5 else []
    prompt = prompt_formats.report_review_prompt(
        json.dumps(draft, ensure_ascii=False)[:prompt_formats.REVIEW_DRAFT_TRUNC], known)
    patch = {}
    if has_issues and rng.random() < 0.6:
        tgt = issues[0]["target"]
        if tgt == "overview":
            patch["overview"] = draft["overview"] + _fill(
                rng, rng.choice(PROSE_TEMPLATES))[:80]
        elif tgt in draft and isinstance(draft[tgt], list) and draft[tgt]:
            fixed = dict(draft[tgt][0])
            fixed["refs"] = sorted(set(
                (fixed.get("refs") or []) + [rng.choice(q_ids)]))
            patch[tgt] = [fixed] + draft[tgt][1:]
    target = json.dumps({
        "pass": not has_issues,
        "quality_score": round(rng.uniform(0.75, 0.95) if not has_issues
                               else rng.uniform(0.4, 0.7), 2),
        "issues": issues,
        "patch": patch,
    }, ensure_ascii=False)
    return prompt + "\n" + target


def gen_repair_example(rng, scenarios):
    """Repair re-prompt examples (prompt_formats.report_repair_prompt —
    serving report_v3._repair_reprompt). The target is the full corrected
    draft with the flaw fixed and structure unchanged."""
    topic = rng.choice(TOPICS)
    n_q = rng.randint(2, 4)
    q_ids = [f"Q{i + 1}" for i in range(n_q)]
    fixed = _report_draft(rng, topic, q_ids, n_q)
    broken = json.loads(json.dumps(fixed))  # deep copy
    flaw = rng.choice(["refs", "overview", "open_questions"])
    if flaw == "refs" and broken["needs"]:
        broken["needs"][0]["refs"] = []
        issues = [{"type": "missing_ref", "severity": "medium",
                   "message": "需求项缺少证据引用，请补充 refs。",
                   "target": "needs"}]
    elif flaw == "overview":
        broken["overview"] = broken["overview"][:24]
        issues = [{"type": "too_short", "severity": "medium",
                   "message": "总览篇幅不足，未覆盖核心发现与约束。",
                   "target": "overview"}]
    else:
        broken["open_questions"] = []
        issues = [{"type": "incomplete", "severity": "low",
                   "message": "缺少待澄清问题列表，请补充。",
                   "target": "open_questions"}]
    prompt = prompt_formats.report_repair_prompt(
        json.dumps(broken, ensure_ascii=False)[:prompt_formats.REVIEW_DRAFT_TRUNC], issues)
    return prompt + "\n" + json.dumps(fixed, ensure_ascii=False)


def gen_summary_example(rng):
    body = "。".join(
        _fill(rng, rng.choice(PROSE_TEMPLATES))
        for _ in range(rng.randint(2, 5))
    )
    summary = (
        f"要点：1) {rng.choice(PAIN_POINTS)}；2) 目标是{rng.choice(GOALS)}；"
        f"3) 约束：{rng.choice(CONSTRAINTS)}。"
    )
    prompt = f"请将以下文档压缩为不超过700字的要点摘要：\n{body}"
    return prompt + "\n" + summary


def gen_search_decision_example(rng):
    topic = rng.choice(TOPICS)
    need = rng.random() < 0.4
    prompt = (
        "判断以下访谈话题是否需要联网检索外部信息，输出 JSON "
        '{"need_search": bool, "query": "检索词"}：' + topic
    )
    target = json.dumps(
        {"need_search": need, "query": topic[:20] if need else ""},
        ensure_ascii=False,
    )
    return prompt + "\n" + target


def gen_assessment_example(rng, scenarios):
    dim = rng.choice(rng.choice(scenarios)["dimensions"])
    question = _question_json(rng, dim)["question"]
    ans = _answer_text(rng)
    # score correlates with answer length/specificity so the model learns
    # a signal, not noise
    rich = len(ans) > 60
    score = round(rng.uniform(0.55, 0.95) if rich
                  else rng.uniform(0.2, 0.6), 2)
    prompt = prompt_formats.assessment_prompt(question, ans)
    target = json.dumps(
        {"score": score,
         "reason": "回答包含具体场景与量化信息" if score > 0.6
         else "回答较为笼统，缺少具体事实"},
        ensure_ascii=False)
    return prompt + "\n" + target


def gen_chat_example(rng, scenarios):
    """Assistant chat (web/runtime/assistant.py:154-168 prompt shape)."""
    sc = rng.choice(scenarios)
    dim = rng.choice(sc["dimensions"])
    chat_topic = rng.choice(TOPICS)
    cq = _question_json(rng, dim, topic=chat_topic)
    aspect = rng.choice(dim.get("key_aspects") or [dim.get("name", "")])
    user_q = rng.choice(CHAT_QUESTIONS)
    parts = [
        "你是访谈助手，帮助受访者理解并回答当前问题。结合上下文给出"
        "简明建议（不超过200字）。",
        f"访谈主题：{chat_topic}",
    ]
    if rng.random() < 0.5:
        parts.append(f"最近问答：\n问：{cq['question']}\n答：{_answer_text(rng)}")
    parts.append(f"用户提问：{user_q}")
    parts.append(f"当前问题：{cq['question']}")
    if cq.get("options"):
        parts.append(f"选项：{'、'.join(cq['options'])}")
    if "区别" in user_q or "分析" in user_q:
        parts.append("请逐个简析选项差异，并给出你建议选择的一项。")
    elif "意思" in user_q or "理解" in user_q:
        parts.append("请先用一句话解释这个问题在问什么，再给回答思路。")
    opts = cq["options"]
    reply = rng.choice(CHAT_REPLIES).format(
        aspect=aspect, opt1=opts[0], opt2=opts[min(1, len(opts) - 1)],
        pain_short=_short(rng.choice(PAIN_POINTS)),
        constraint=_short(rng.choice(CONSTRAINTS), 18),
    )
    return "\n".join(parts) + "\n" + reply


def gen_scenario_example(rng, scenarios):
    """AI scenario generation (web/scenarios.py:175-183 prompt shape)."""
    topic = rng.choice(TOPICS)
    desc = f"{topic}。{_fill(rng, rng.choice(TOPIC_DESCS))}"
    prompt = (
        "请基于以下业务描述设计一个结构化访谈场景，输出 JSON，字段："
        "name/description/icon/keywords/dimensions(每个含 id/name/description/"
        "key_aspects/min_questions/max_questions)/report。\n业务描述：" + desc
    )
    base = rng.choice(scenarios)
    dims = []
    names = rng.sample(["目标价值", "业务流程", "数据现状", "技术约束",
                        "组织与人员", "实施计划", "风险与合规"],
                       rng.randint(3, 5))
    for i, name in enumerate(names):
        dims.append({
            "id": f"dim_{i + 1}",
            "name": name,
            "description": f"围绕{name}梳理现状、目标与差距。",
            "key_aspects": rng.sample(
                ["现状盘点", "量化影响", "期望目标", "关键角色",
                 "历史尝试", "边界约束"], rng.randint(2, 4)),
            "min_questions": 2,
            "max_questions": rng.randint(3, 5),
        })
    payload = {
        "name": topic[:12],
        "description": desc[:80],
        "icon": rng.choice(["📋", "🏭", "🏦", "🛒", "🏥", "⚡", "📦"]),
        "keywords": [topic[:4], topic[4:8] or topic[:4],
                     names[0]],
        "dimensions": dims,
        "report": (base.get("report") or
                   {"template": "standard", "sections": ["overview",
                                                         "needs",
                                                         "solutions"]}),
    }
    return prompt + "\n" + json.dumps(payload, ensure_ascii=False)


def gen_solution_copy_example(rng):
    """Solution chapter copy + quality review
    (web/runtime/solution.py:468-476 prompt shape)."""
    overview = (
        f"本报告基于对「{rng.choice(TOPICS)}」的结构化访谈整理。"
        f"核心发现：{rng.choice(PAIN_POINTS)}；业务目标为{rng.choice(GOALS)}。"
    )
    prompt = (
        "请为以下方案页撰写章节文案并做质量评审，输出 JSON："
        '{"chapter_copy": {"value_statement", "approach", '
        '"commitment"}, "quality_review": {"score": 0-1, '
        '"verdict", "strengths": [], "concerns": []}}。\n\n'
        f"方案概述：{overview}"
    )
    score = round(rng.uniform(0.55, 0.95), 2)
    payload = {
        "chapter_copy": {
            "value_statement": _fill(rng, rng.choice(SOLUTION_VALUE)),
            "approach": _fill(rng, rng.choice(SOLUTION_APPROACH)),
            "commitment": rng.choice(SOLUTION_COMMITMENT),
        },
        "quality_review": {
            "score": score,
            "verdict": "可发布" if score >= 0.7 else "建议补强",
            "strengths": rng.sample(
                ["证据引用完整", "阶段目标可量化", "风险应对具体",
                 "行动项有时限", "约束考虑充分"], 2),
            "concerns": ([] if score >= 0.8 else
                         rng.sample(["部分结论证据偏弱", "预算口径需再确认",
                                     "缺少回退方案细节"], 1)),
        },
    }
    return prompt + "\n" + json.dumps(payload, ensure_ascii=False)


def gen_prose(rng):
    return _fill(rng, rng.choice(PROSE_TEMPLATES))


GENS = [
    (gen_question_example, 0.28, True),
    (gen_report_example, 0.16, True),
    (gen_review_example, 0.05, True),
    (gen_repair_example, 0.03, True),
    (gen_summary_example, 0.10, False),
    (gen_search_decision_example, 0.05, False),
    (gen_assessment_example, 0.06, True),
    (gen_chat_example, 0.08, True),
    (gen_scenario_example, 0.06, True),
    (gen_solution_copy_example, 0.05, False),
    (gen_prose, 0.08, False),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/corpus/dv_corpus.txt")
    ap.add_argument("--mb", type=float, default=120.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = random.Random(args.seed)
    scenarios = load_scenarios()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    target_bytes = int(args.mb * 1024 * 1024)
    written = 0
    n = 0
    weights = [w for _, w, _ in GENS]
    with open(args.out, "w", encoding="utf-8") as fh:
        while written < target_bytes:
            gen, _, needs_sc = rng.choices(GENS, weights=weights)[0]
            text = gen(rng, scenarios) if needs_sc else gen(rng)
            if rng.random() < 0.05:
                text += "\n" + rng.choice(EN_PROSE)
            doc = text + "\n<|eot|>\n"
            fh.write(doc)
            written += len(doc.encode("utf-8"))
            n += 1
    print(f"wrote {n} documents, {written/1e6:.1f} MB -> {args.out}")


if __name__ == "__main__":
    main()
